"""Window reductions on NHWC tensors (VPU-friendly, XLA reduce_window)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def avg_pool_3x3_valid(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-1 VALID average pool over the H,W axes of ...HWC.

    Matches torch ``F.avg_pool2d(x, 3, 1)`` (padding 0) used by the SSIM
    loss windows (reference src/loss.py:72-77).
    """
    ndim = x.ndim
    dims = [1] * ndim
    dims[-3] = dims[-2] = 3
    strides = [1] * ndim
    s = lax.reduce_window(x.astype(jnp.float32), 0.0, lax.add,
                          tuple(dims), tuple(strides), "VALID")
    return (s / 9.0).astype(x.dtype)


def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 stride-2 max pool over the H,W axes of ...HWC.

    Matches torch ``nn.MaxPool2d(2, 2)`` used by HNED's VGG trunk
    (reference src/models/hned.py:21) and the legacy U-Net encoder
    (reference src/models/u_net.py:45).
    """
    ndim = x.ndim
    dims = [1] * ndim
    dims[-3] = dims[-2] = 2
    strides = list(dims)
    neg_inf = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(x, neg_inf, lax.max, tuple(dims), tuple(strides),
                             "VALID")

"""Normalization layer factory (reference src/models/networks.py:18-35).

- 'instance': per-sample per-channel over H,W, no affine params, no running
  stats (torch InstanceNorm2d(affine=False, track_running_stats=False)).
- 'batch': affine BatchNorm with running stats (torch BatchNorm2d defaults);
  callers must thread the flax ``batch_stats`` collection.
- 'none': identity.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class InstanceNorm(nn.Module):
    """InstanceNorm over the H,W axes of NHWC, non-affine."""
    epsilon: float = 1e-5
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(-3, -2), keepdims=True)
        var = jnp.var(xf, axis=(-3, -2), keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y.astype(x.dtype)


class Identity(nn.Module):
    @nn.compact
    def __call__(self, x):
        return x


def get_norm_layer(norm_type: str = "instance", dtype: Optional[Any] = None,
                   train: bool = False) -> Callable[..., nn.Module]:
    if norm_type == "instance":
        return lambda name=None: InstanceNorm(dtype=dtype, name=name)
    if norm_type == "batch":
        # momentum 0.9 == torch's (1 - 0.1) convention
        return lambda name=None: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=dtype, name=name)
    if norm_type == "none":
        return lambda name=None: Identity(name=name)
    raise NotImplementedError(
        f"normalization layer [{norm_type}] is not found")


def norm_uses_bias(norm_type: str) -> bool:
    """Convs followed by BatchNorm skip bias (reference
    src/models/networks.py:336-339)."""
    return norm_type != "batch"

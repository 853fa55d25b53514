"""One-hot encoding of segmentation id maps.

Capability parity with ``transform_seg_one_hot`` (reference
src/models/net_utils.py:14-24), NHWC layout: (..., H, W) int ids ->
(..., H, W, n_cls) float one-hot.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def seg_one_hot(seg: jnp.ndarray, n_cls: int,
                dtype=jnp.float32) -> jnp.ndarray:
    return jax.nn.one_hot(seg.astype(jnp.int32), n_cls, dtype=dtype)

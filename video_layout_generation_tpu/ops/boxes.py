"""Mask -> bounding-box extraction.

Capability parity with ``mask2box`` (reference src/models/net_utils.py:27-41):
given masks where the *outer* region is 1, return per-sample bboxes
(h1, w1, h2, w2) of the inner (zero) region. The reference loops in Python
over the batch with ``torch.nonzero``; here it is a fully vectorized, jittable
min/max over masked index grids (static shapes, TPU-friendly).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def mask2box(mask: jnp.ndarray) -> jnp.ndarray:
    """mask: (N, H, W), outer region 1. Returns (N, 4) int32
    [h_min, w_min, h_max, w_max] of the inner (mask==0) region.

    Samples with no inner region return [H, W, -1, -1] (empty box).
    """
    n, h, w = mask.shape
    inner = (mask == 0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, h, w), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, h, w), 2)
    big = jnp.int32(h + w)
    h_min = jnp.min(jnp.where(inner, rows, big), axis=(1, 2))
    w_min = jnp.min(jnp.where(inner, cols, big), axis=(1, 2))
    h_max = jnp.max(jnp.where(inner, rows, -1), axis=(1, 2))
    w_max = jnp.max(jnp.where(inner, cols, -1), axis=(1, 2))
    h_min = jnp.minimum(h_min, h)
    w_min = jnp.minimum(w_min, w)
    return jnp.stack([h_min, w_min, h_max, w_max], axis=1)

"""CoordConv coordinate channels.

Replaces the reference ``AddCoords`` (reference src/models/modules.py:65-96),
which hardcoded a 256x256 CUDA grid; here the normalized x/y channels are
built from the actual static H,W at trace time, so any resolution works and
XLA constant-folds the iota.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def add_coord_channels(x: jnp.ndarray) -> jnp.ndarray:
    """Append normalized coordinate channels to an NHWC tensor.

    Matches the reference's convention: values span [-1, 1] as
    ``(arange(n)/255)*2-1`` generalized to ``(arange(n)/(n-1))*2-1``; the
    xx channel varies along H and yy along W (after the reference's
    transpose dance in src/models/modules.py:88-89).
    """
    n, h, w, _ = x.shape
    dt = x.dtype
    hh = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) / max(h - 1, 1)) * 2 - 1
    ww = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) / max(w - 1, 1)) * 2 - 1
    hh = jnp.broadcast_to(hh[None, :, :, None], (n, h, w, 1)).astype(dt)
    ww = jnp.broadcast_to(ww[None, :, :, None], (n, h, w, 1)).astype(dt)
    return jnp.concatenate([x, hh, ww], axis=-1)

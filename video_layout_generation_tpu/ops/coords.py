"""CoordConv coordinate channels.

Replaces the reference ``AddCoords`` (reference src/models/modules.py:65-96),
which hardcoded a 256x256 CUDA grid; here the normalized x/y channels are
built from the actual static H,W at trace time, so any resolution works and
XLA constant-folds the iota.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def coord_grid(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """(h, w, 2) normalized coordinate grid in [-1, 1]: channel 0 varies
    along H, channel 1 along W (the reference's convention after its
    transpose dance, src/models/modules.py:88-89)."""
    hh = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
          / max(h - 1, 1)) * 2 - 1
    ww = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
          / max(w - 1, 1)) * 2 - 1
    return jnp.stack([hh, ww], axis=-1).astype(dtype)


def add_coord_channels(x: jnp.ndarray) -> jnp.ndarray:
    """Append normalized coordinate channels to an NHWC tensor.

    Matches the reference's convention: values span [-1, 1] as
    ``(arange(n)/255)*2-1`` generalized to ``(arange(n)/(n-1))*2-1``; the
    xx channel varies along H and yy along W (after the reference's
    transpose dance in src/models/modules.py:88-89).
    """
    n, h, w, _ = x.shape
    grid = jnp.broadcast_to(coord_grid(h, w, x.dtype)[None],
                            (n, h, w, 2))
    return jnp.concatenate([x, grid], axis=-1)

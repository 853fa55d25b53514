"""Input assembly + normalization constants (NHWC).

Parity with the reference hot-loop preprocessing (src/trainer.py:120-123,
190-197): ImageNet normalization of frames, the model-output affine map, and
channel concatenation of [edge1, seg1, frame1, frame2, seg2, edge2] (10ch
with edges, src/trainer.py:197) or [seg1, frame1, frame2, seg2] (8ch, the
rollout contract, src/trainer.py:461).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)   # reference src/trainer.py:123
IMAGENET_STD = (0.229, 0.224, 0.225)    # reference src/trainer.py:122
OUT_MEAN = (-0.03, -0.088, -0.188)      # reference src/trainer.py:120
OUT_STD = (0.448, 0.448, 0.450)         # reference src/trainer.py:121


def _c(vals, dtype=jnp.float32):
    return jnp.asarray(vals, dtype)


def normalize_image(img: jnp.ndarray) -> jnp.ndarray:
    """[0,1] RGB -> ImageNet-normalized."""
    return (img - _c(IMAGENET_MEAN)) / _c(IMAGENET_STD)


def denormalize_image(img: jnp.ndarray) -> jnp.ndarray:
    """ImageNet-normalized -> [0,1]-range RGB (reference src/trainer.py:215)."""
    return img * _c(IMAGENET_STD) + _c(IMAGENET_MEAN)


def normalize_model_output(img: jnp.ndarray) -> jnp.ndarray:
    """Map raw model img head output into ImageNet-normalized space
    (reference src/trainer.py:212)."""
    return (img - _c(OUT_MEAN)) / _c(OUT_STD)


def assemble_model_input(seg1: jnp.ndarray, frame1: jnp.ndarray,
                         frame2: jnp.ndarray, seg2: jnp.ndarray,
                         edge1: Optional[jnp.ndarray] = None,
                         edge2: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Concatenate the model input channels.

    frames must already be ImageNet-normalized; segs are float class ids
    (N,H,W,1); edges are the fused HNED map (N,H,W,1) or None.
    """
    if edge1 is not None:
        parts = [edge1, seg1, frame1, frame2, seg2, edge2]
    else:
        parts = [seg1, frame1, frame2, seg2]
    return jnp.concatenate(parts, axis=-1)

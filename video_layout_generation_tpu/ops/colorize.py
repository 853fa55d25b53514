"""Segmentation-id -> RGB colorization via the Cityscapes palette LUT.

Parity with the reference's 20-entry palette (reference src/trainer.py:31-52)
and its ``vis_seg_mask`` (reference src/trainer.py:416-427). The LUT gather is
expressed as one-hot @ palette so it can fuse onto the MXU for large batches.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Cityscapes train-id palette; index 19 is the void/ignore class.
CITYSCAPES_COLORS = np.array([
    [128, 64, 128],    # road
    [244, 35, 232],    # sidewalk
    [70, 70, 70],      # building
    [102, 102, 156],   # wall
    [190, 153, 153],   # fence
    [153, 153, 153],   # pole
    [250, 170, 30],    # traffic light
    [220, 220, 0],     # traffic sign
    [107, 142, 35],    # vegetation
    [152, 251, 152],   # terrain
    [70, 130, 180],    # sky
    [220, 20, 60],     # person
    [255, 0, 0],       # rider
    [0, 0, 142],       # car
    [0, 0, 70],        # truck
    [0, 60, 100],      # bus
    [0, 80, 100],      # train
    [0, 0, 230],       # motorcycle
    [119, 11, 32],     # bicycle
    [0, 0, 0],         # none / void
], dtype=np.uint8)


def colorize_seg(seg, n_classes: int = 20, argmax: bool = False,
                 palette: np.ndarray | None = None) -> jnp.ndarray:
    """Colorize segmentation into normalized RGB.

    Args:
      seg: either logits (..., H, W, C) when ``argmax=True`` or integer ids
        (..., H, W).
      n_classes: palette size to use.
      argmax: take channel argmax first.
    Returns:
      float32 RGB in [0, 1], shape (..., H, W, 3).
    """
    pal = CITYSCAPES_COLORS if palette is None else palette
    if argmax:
        seg = jnp.argmax(seg, axis=-1)
    lut = jnp.asarray(pal[:n_classes], dtype=jnp.float32) / 255.0
    return jnp.take(lut, seg.astype(jnp.int32), axis=0)

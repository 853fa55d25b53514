"""Prediction export: colorized PNGs and raw .npy stacks.

Parity with the reference's two export paths:
- colorized per-image PNG save (legacy eval CLI, src/val.py:172-187),
- raw tensor dumps of stacked inputs/predictions during validation and
  rollout (src/trainer.py:348-351, 470-476).
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

from ..ops.colorize import CITYSCAPES_COLORS


def save_colorized_png(path: str, seg_ids: np.ndarray,
                       palette: np.ndarray = None):
    """seg_ids: (H, W) integer class map -> RGB PNG."""
    pal = CITYSCAPES_COLORS if palette is None else palette
    rgb = pal[np.asarray(seg_ids, np.int64) % len(pal)].astype(np.uint8)
    try:
        import cv2
        cv2.imwrite(path, rgb[..., ::-1])  # cv2 writes BGR
    except Exception:
        from PIL import Image
        Image.fromarray(rgb).save(path)


def save_npy_stack(directory: str, tag: str, arrays: Dict[str, np.ndarray]):
    """Dump named arrays as <dir>/<tag>_<name>.npy."""
    os.makedirs(directory, exist_ok=True)
    for name, arr in arrays.items():
        np.save(os.path.join(directory, f"{tag}_{name}.npy"),
                np.asarray(arr))

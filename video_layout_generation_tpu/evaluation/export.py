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

_native_writer = None


def _get_native_writer():
    global _native_writer
    if _native_writer is None:
        try:
            from ..io.native_loader import NativeImageLoader
            _native_writer = NativeImageLoader(n_threads=1)
        except Exception:  # native lib optional
            _native_writer = False
    return _native_writer


def save_colorized_png(path: str, seg_ids: np.ndarray,
                       palette: np.ndarray = None):
    """seg_ids: (H, W) integer class map -> RGB PNG. Prefers the native
    writer (libdeflate; native/vlg_loader.cpp), falling back to cv2/PIL."""
    pal = CITYSCAPES_COLORS if palette is None else palette
    rgb = pal[np.asarray(seg_ids, np.int64) % len(pal)].astype(np.uint8)
    writer = _get_native_writer()
    if writer:
        # level 1: 788 img/s at 256px on one core (cv2 default: 295 img/s
        # with 2.9x larger files; PIL: 41) — eval export wants throughput
        writer.save_png(path, rgb, level=1)
        return
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

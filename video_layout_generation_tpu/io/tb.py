"""TensorBoard writer shim.

Uses tensorboardX when available (the reference's writer,
src/trainer.py:17,142) and degrades to a no-op otherwise so headless/test
environments stay hermetic. Accepts NHWC numpy/JAX images.
"""

from __future__ import annotations

import numpy as np

try:
    from tensorboardX import SummaryWriter as _TBX
except Exception:  # pragma: no cover
    _TBX = None


class SummaryWriter:
    def __init__(self, logdir=None, enabled: bool = True):
        self._w = _TBX(logdir) if (enabled and _TBX is not None
                                   and logdir is not None) else None

    def add_scalar(self, tag, value, step):
        if self._w is not None:
            self._w.add_scalar(tag, float(value), int(step))

    def add_image(self, tag, img_nhwc, step, max_images: int = 8):
        """img_nhwc: (N,H,W,C) in [0,1]; writes a simple grid."""
        if self._w is None:
            return
        arr = np.asarray(img_nhwc)[:max_images]
        arr = np.clip(arr, 0.0, 1.0)
        n, h, w, c = arr.shape
        grid = arr.transpose(1, 0, 2, 3).reshape(h, n * w, c)
        self._w.add_image(tag, grid.transpose(2, 0, 1), int(step))

    def flush(self):
        if self._w is not None:
            self._w.flush()

    def close(self):
        if self._w is not None:
            self._w.close()

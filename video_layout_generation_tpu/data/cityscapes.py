"""Cityscapes triplet dataset (host-side decode).

Capability parity with the reference DatasetFolder (src/folder.py:49-135):
loads 3 segmentation maps (grayscale, nearest-resized to the target size)
and 3 RGB frames (BGR->RGB) per sample and returns the 6-field contract
described in data/synthetic.py.

Decode backends, fastest available first:
  1. the native C++ loader (native/vlg_loader; PNG decode + resize in a
     thread pool) when built,
  2. cv2,
  3. PIL.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from .index import build_triplet_index

try:
    from ..io.native_loader import NativeImageLoader
except Exception:  # pragma: no cover - native lib optional
    NativeImageLoader = None

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

try:
    from PIL import Image
except Exception:  # pragma: no cover
    Image = None


def _load_rgb(path: str, hw: Tuple[int, int]) -> np.ndarray:
    if cv2 is not None:
        im = cv2.imread(path)
        if im is None:
            raise FileNotFoundError(path)
        im = cv2.cvtColor(im, cv2.COLOR_BGR2RGB)
        if im.shape[:2] != hw:
            im = cv2.resize(im, dsize=(hw[1], hw[0]),
                            interpolation=cv2.INTER_LINEAR)
        return im.astype(np.float32) / 255.0
    im = Image.open(path).convert("RGB")
    if im.size != (hw[1], hw[0]):
        im = im.resize((hw[1], hw[0]), Image.BILINEAR)
    return np.asarray(im, np.float32) / 255.0


def _load_seg(path: str, hw: Tuple[int, int]) -> np.ndarray:
    if cv2 is not None:
        im = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        if im is None:
            raise FileNotFoundError(path)
        if im.shape[:2] != hw:
            im = cv2.resize(im, dsize=(hw[1], hw[0]),
                            interpolation=cv2.INTER_NEAREST)
        return im.astype(np.int32)
    im = Image.open(path).convert("L")
    if im.size != (hw[1], hw[0]):
        im = im.resize((hw[1], hw[0]), Image.NEAREST)
    return np.asarray(im, np.int32)


class CityscapesTriplets:
    def __init__(self, root: str, image_hw: Tuple[int, int] = (256, 256),
                 use_native: bool = True):
        self.samples = build_triplet_index(root)
        if not self.samples:
            raise RuntimeError(f"Found 0 triplets under {root}")
        self.hw = tuple(image_hw)
        self._native = None
        if use_native and NativeImageLoader is not None:
            try:
                self._native = NativeImageLoader()
            except Exception:
                self._native = None

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        seg_paths, img_paths = self.samples[index]
        if self._native is not None:
            imgs = [self._native.load_rgb(p, self.hw) for p in img_paths]
            segs = [self._native.load_gray(p, self.hw) for p in seg_paths]
        else:
            imgs = [_load_rgb(p, self.hw) for p in img_paths]
            segs = [_load_seg(p, self.hw) for p in seg_paths]
        return {
            "img1": imgs[0], "img2": imgs[1], "img3": imgs[2],
            "seg1": segs[0][..., None].astype(np.float32),
            "seg2": segs[1][..., None].astype(np.float32),
            "seg3": segs[2].astype(np.int32),
        }


class CityscapesSequences(CityscapesTriplets):
    """N-frame stride-3 windows for rollout fidelity evaluation
    (evaluation/sequence.py): ``sequence(i, n)`` returns ground-truth
    (imgs (n,H,W,3), segs (n,H,W)) so generated rollouts can be scored
    against real futures."""

    def __init__(self, root: str, n_frames: int = 10,
                 image_hw: Tuple[int, int] = (256, 256),
                 use_native: bool = True):
        self.n_frames = n_frames
        from .index import build_triplet_index
        self.samples = build_triplet_index(root, stride=3,
                                           n_frames=n_frames)
        if not self.samples:
            raise RuntimeError(
                f"Found 0 {n_frames}-frame windows under {root}")
        self.hw = tuple(image_hw)
        self._native = None
        if use_native and NativeImageLoader is not None:
            try:
                self._native = NativeImageLoader()
            except Exception:
                self._native = None

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        """Stacked window contract {"imgs": (T,H,W,3) f32, "segs": (T,H,W)
        i32} — the multi-step training input (train/multistep.py)."""
        imgs, segs = self.sequence(index, self.n_frames)
        return {"imgs": imgs.astype(np.float32), "segs": segs}

    def sequence(self, index: int, n_frames: int):
        seg_paths, img_paths = self.samples[index]
        n = min(n_frames, len(img_paths))
        if self._native is not None:
            imgs = [self._native.load_rgb(p, self.hw)
                    for p in img_paths[:n]]
            segs = [self._native.load_gray(p, self.hw)
                    for p in seg_paths[:n]]
        else:
            imgs = [_load_rgb(p, self.hw) for p in img_paths[:n]]
            segs = [_load_seg(p, self.hw) for p in seg_paths[:n]]
        import numpy as _np
        return _np.stack(imgs), _np.stack(segs).astype(_np.int32)

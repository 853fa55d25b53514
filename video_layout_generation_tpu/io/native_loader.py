"""ctypes binding to the native data-loading core (native/vlg_loader.cpp).

Framework-owned replacement for the OpenCV decode path the reference used
in its DataLoader workers (reference src/folder.py:122-135): zlib-backed PNG
decode, cv2-semantics resize (half-pixel bilinear for RGB, floor-nearest for
label ids), and a persistent C++ thread pool for batch decode that releases
the GIL for the whole batch.

Build once with ``make -C native``; ``NativeImageLoader`` raises OSError if
the shared library is absent (callers fall back to cv2/PIL).
"""

from __future__ import annotations

import ctypes
import os
from typing import Sequence, Tuple

import numpy as np

_LIB_PATHS = (
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native", "libvlg_loader.so"),
)


def _load_lib() -> ctypes.CDLL:
    last = None
    for p in _LIB_PATHS:
        try:
            return ctypes.CDLL(p)
        except OSError as e:
            last = e
    raise OSError(f"libvlg_loader.so not built (run `make -C native`): "
                  f"{last}")


class NativeImageLoader:
    def __init__(self, n_threads: int = 0):
        self._lib = _load_lib()
        lib = self._lib
        lib.vlg_load_rgb.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                     ctypes.c_int, ctypes.c_int]
        lib.vlg_load_rgb.restype = ctypes.c_int
        lib.vlg_load_gray_ids.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                          ctypes.c_int, ctypes.c_int]
        lib.vlg_load_gray_ids.restype = ctypes.c_int
        lib.vlg_pool_create.argtypes = [ctypes.c_int]
        lib.vlg_pool_create.restype = ctypes.c_void_p
        lib.vlg_pool_destroy.argtypes = [ctypes.c_void_p]
        lib.vlg_pool_load_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.c_int, ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
        lib.vlg_pool_load_batch.restype = ctypes.c_int
        lib.vlg_save_png.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                     ctypes.c_int, ctypes.c_int,
                                     ctypes.c_int, ctypes.c_int]
        lib.vlg_save_png.restype = ctypes.c_int
        n = n_threads or (os.cpu_count() or 1)
        self._pool = lib.vlg_pool_create(n)

    def __del__(self):
        pool = getattr(self, "_pool", None)
        if pool:
            self._lib.vlg_pool_destroy(pool)
            self._pool = None

    # -- single image --------------------------------------------------
    def load_rgb(self, path: str, hw: Tuple[int, int]) -> np.ndarray:
        out = np.empty((hw[0], hw[1], 3), np.float32)
        rc = self._lib.vlg_load_rgb(
            path.encode(), out.ctypes.data_as(ctypes.c_void_p),
            hw[0], hw[1])
        if rc:
            raise FileNotFoundError(path)
        return out

    def load_gray(self, path: str, hw: Tuple[int, int]) -> np.ndarray:
        out = np.empty((hw[0], hw[1]), np.int32)
        rc = self._lib.vlg_load_gray_ids(
            path.encode(), out.ctypes.data_as(ctypes.c_void_p),
            hw[0], hw[1])
        if rc:
            raise FileNotFoundError(path)
        return out

    def save_png(self, path: str, pixels: np.ndarray, level: int = 6):
        """Write (H, W, 3) RGB or (H, W) gray uint8 pixels as a PNG
        (filter-0 rows + libdeflate; the colorized-export writer)."""
        arr = np.ascontiguousarray(pixels, np.uint8)
        ch = 1 if arr.ndim == 2 else arr.shape[2]
        rc = self._lib.vlg_save_png(
            path.encode(), arr.ctypes.data_as(ctypes.c_void_p),
            arr.shape[0], arr.shape[1], ch, level)
        if rc:
            raise IOError(f"PNG encode failed for {path}")

    # -- batched (thread-pool, GIL released) ---------------------------
    def load_rgb_batch(self, paths: Sequence[str],
                       hw: Tuple[int, int]) -> np.ndarray:
        n = len(paths)
        out = np.empty((n, hw[0], hw[1], 3), np.float32)
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        rc = self._lib.vlg_pool_load_batch(
            self._pool, arr, n, 0, out.ctypes.data_as(ctypes.c_void_p),
            hw[0], hw[1])
        if rc:
            raise IOError(f"{rc} of {n} images failed to decode")
        return out

    def load_gray_batch(self, paths: Sequence[str],
                        hw: Tuple[int, int]) -> np.ndarray:
        n = len(paths)
        out = np.empty((n, hw[0], hw[1]), np.int32)
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        rc = self._lib.vlg_pool_load_batch(
            self._pool, arr, n, 1, out.ctypes.data_as(ctypes.c_void_p),
            hw[0], hw[1])
        if rc:
            raise IOError(f"{rc} of {n} images failed to decode")
        return out

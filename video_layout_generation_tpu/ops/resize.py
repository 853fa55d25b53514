"""MXU-friendly image resize.

Separable resize expressed as two small dense matmuls instead of gathers:
``out = A_h @ x @ A_w^T`` applied along the spatial axes of an NHWC tensor.
The interpolation matrices are built once at trace time (static shapes), so
XLA lowers the whole resize onto the MXU and fuses it with neighboring ops.
This also gives exact control over coordinate conventions, which the rebuild
needs in three flavors:

- ``align_corners=True`` bilinear — torch ``nn.Upsample(align_corners=True)``
  used by the reference GridNet up blocks (reference src/models/modules.py:50)
  and legacy decoders.
- ``align_corners=False`` (half-pixel) bilinear — torch
  ``F.interpolate(mode='bilinear')`` used by HNED score upsampling
  (reference src/models/hned.py:92-96).
- floor-nearest — cv2 ``INTER_NEAREST`` used for segmentation maps
  (reference src/folder.py:134, src/trainer.py:437).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _interp_matrix_np(in_size: int, out_size: int, method: str,
                      align_corners: bool) -> np.ndarray:
    """Return (out_size, in_size) row-stochastic interpolation matrix."""
    A = np.zeros((out_size, in_size), dtype=np.float32)
    if method == "nearest":
        # cv2 INTER_NEAREST / torch 'nearest': src = floor(dst * in/out)
        scale = in_size / out_size
        src = np.minimum((np.arange(out_size) * scale).astype(np.int64),
                         in_size - 1)
        A[np.arange(out_size), src] = 1.0
        return A
    if method != "bilinear":
        raise ValueError(f"unknown resize method {method!r}")
    if in_size == 1:
        A[:, 0] = 1.0
        return A
    if align_corners:
        if out_size == 1:
            A[0, 0] = 1.0
            return A
        src = np.arange(out_size) * (in_size - 1) / (out_size - 1)
    else:
        src = (np.arange(out_size) + 0.5) * in_size / out_size - 0.5
        src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (src - lo).astype(np.float32)
    A[np.arange(out_size), lo] += 1.0 - frac
    A[np.arange(out_size), hi] += frac
    return A


def interp_matrix(in_size: int, out_size: int, method: str = "bilinear",
                  align_corners: bool = False) -> jnp.ndarray:
    return jnp.asarray(_interp_matrix_np(in_size, out_size, method,
                                         bool(align_corners)))


def _apply_separable(x: jnp.ndarray, ah: jnp.ndarray, aw: jnp.ndarray,
                     exact: bool = True) -> jnp.ndarray:
    """x: (..., H, W, C); ah: (H2, H); aw: (W2, W).

    exact=True runs the interpolation in fp32 at HIGHEST matmul precision
    (bit-parity with torch/cv2 — data path, HNED score maps). exact=False
    keeps the input dtype at default precision — the fast in-model path
    where bf16 interpolation error is irrelevant next to conv bf16.
    """
    dtype = x.dtype
    if exact:
        xf = x.astype(jnp.float32)
        prec = jax.lax.Precision.HIGHEST
        pet = jnp.float32
    else:
        xf = x
        prec = None
        pet = dtype
    y = jnp.einsum("ph,...hwc->...pwc", ah.astype(xf.dtype), xf,
                   precision=prec, preferred_element_type=pet)
    y = jnp.einsum("qw,...pwc->...pqc", aw.astype(xf.dtype), y,
                   precision=prec, preferred_element_type=pet)
    return y.astype(dtype)


def resize_bilinear(x: jnp.ndarray, out_hw, align_corners: bool = False
                    ) -> jnp.ndarray:
    """Bilinear resize of an NHWC (or ...HWC) tensor to ``out_hw``."""
    h, w = x.shape[-3], x.shape[-2]
    h2, w2 = out_hw
    if (h, w) == (h2, w2):
        return x
    ah = interp_matrix(h, h2, "bilinear", align_corners)
    aw = interp_matrix(w, w2, "bilinear", align_corners)
    return _apply_separable(x, ah, aw)


def resize_nearest(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Floor-nearest resize (cv2 INTER_NEAREST semantics) of ...HWC."""
    h, w = x.shape[-3], x.shape[-2]
    h2, w2 = out_hw
    if (h, w) == (h2, w2):
        return x
    # Nearest is a pure gather; use take for integer dtypes (exact), matmul
    # would densify the 0/1 matrix but lose integer dtype.
    sh = np.minimum((np.arange(h2) * (h / h2)).astype(np.int64), h - 1)
    sw = np.minimum((np.arange(w2) * (w / w2)).astype(np.int64), w - 1)
    y = jnp.take(x, jnp.asarray(sh), axis=-3)
    y = jnp.take(y, jnp.asarray(sw), axis=-2)
    return y


def upsample2x_bilinear_align(x: jnp.ndarray,
                              exact: bool = False) -> jnp.ndarray:
    """x2 bilinear upsample with align_corners=True (torch Upsample parity).

    Default is the fast in-dtype path (model blocks); pass exact=True for
    fp32 bit-parity.
    """
    h, w = x.shape[-3], x.shape[-2]
    ah = interp_matrix(h, 2 * h, "bilinear", True)
    aw = interp_matrix(w, 2 * w, "bilinear", True)
    return _apply_separable(x, ah, aw, exact=exact)

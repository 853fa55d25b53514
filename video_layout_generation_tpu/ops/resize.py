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

    Default is the fast in-dtype path (model blocks) — the banded stencil
    form, numerically identical to the matrix form (same coefficients, two
    nonzero taps per row). exact=True keeps the fp32 HIGHEST-precision
    matmul form for data-path bit-parity.
    """
    if not exact:
        return upsample2x_bilinear_align_stencil(x)
    h, w = x.shape[-3], x.shape[-2]
    ah = interp_matrix(h, 2 * h, "bilinear", True)
    aw = interp_matrix(w, 2 * w, "bilinear", True)
    return _apply_separable(x, ah, aw, exact=True)


# ---- banded 2x upsample (stencil form) -----------------------------------
#
# The x2 align-corners matrix is 2-banded: every output row r draws only
# from input rows r//2 + {-1, 0, 1} (proof: src = r*(H-1)/(2H-1) lies in
# (r//2 - 0.504, r//2 + 0.5)). The einsum form pays a dense (2H, H) matmul
# — 32x the useful FLOPs and measured 3.2-4.9 ms per call in the b=128
# rollout step — while the banded form is three shifted elementwise blends
# (HBM-bound, sub-ms). Band coefficients are extracted from the SAME
# matrix, so semantics cannot drift; extraction asserts full coverage.


@functools.lru_cache(maxsize=None)
def _band_vectors_np(in_size: int, align_corners: bool):
    """(b_{-1}, b_0, b_{+1}) with b_d[r] = A[r, r//2 + d]; asserts the
    bands reproduce the full x2 interpolation matrix."""
    A = _interp_matrix_np(in_size, 2 * in_size, "bilinear", align_corners)
    out_size = 2 * in_size
    rows = np.arange(out_size)
    base = rows // 2
    cover = np.zeros_like(A)
    bands = []
    for d in (-1, 0, 1):
        idx = base + d
        valid = (idx >= 0) & (idx < in_size)
        b = np.zeros(out_size, np.float32)
        b[valid] = A[rows[valid], idx[valid]]
        cover[rows[valid], idx[valid]] += b[valid]
        bands.append(b)
    assert np.array_equal(cover, A), "x2 matrix is not 3-banded"
    return tuple(bands)


def _upsample2x_axis_phases(x: jnp.ndarray, axis: int,
                            align_corners: bool):
    """Return (even, odd) phase tensors of the x2 upsample along ``axis``
    (each the same shape as x), via three shifted blends."""
    h = x.shape[axis]
    bands = _band_vectors_np(h, align_corners)
    nd = x.ndim
    ax = axis % nd

    def shifted(dx: int):
        pad = [(0, 0)] * nd
        if dx == -1:
            pad[ax] = (1, 0)
            sl = [slice(None)] * nd
            sl[ax] = slice(0, h)
            return jnp.pad(x, pad)[tuple(sl)]
        pad[ax] = (0, 1)
        sl = [slice(None)] * nd
        sl[ax] = slice(1, h + 1)
        return jnp.pad(x, pad)[tuple(sl)]

    xm, xp = shifted(-1), shifted(1)
    cshape = [1] * nd
    cshape[ax] = h
    outs = []
    for e in (0, 1):
        acc = None
        for b, xs in zip(bands, (xm, x, xp)):
            c = jnp.asarray(b[e::2], x.dtype).reshape(cshape)
            term = c * xs
            acc = term if acc is None else acc + term
        outs.append(acc)
    return outs[0], outs[1]


def upsample2x_phases(x: jnp.ndarray, align_corners: bool = True):
    """All four x2 phase tensors [(dy,dx) = 00, 01, 10, 11] of an ...HWC
    tensor, each of the input's spatial shape."""
    e0, e1 = _upsample2x_axis_phases(x, -3, align_corners)
    ph = []
    for ey in (e0, e1):
        q0, q1 = _upsample2x_axis_phases(ey, -2, align_corners)
        ph.extend((q0, q1))
    return ph


def upsample2x_bilinear_align_stencil(x: jnp.ndarray) -> jnp.ndarray:
    """Banded-form equivalent of ``upsample2x_bilinear_align`` (fast
    path): phases computed by shifted blends, then interleaved."""
    ph = upsample2x_phases(x, True)
    h, w = x.shape[-3], x.shape[-2]
    c = x.shape[-1]
    y = jnp.stack(ph, axis=-4)                      # (..., 4, H, W, C)
    lead = y.shape[:-4]
    y = y.reshape(lead + (2, 2, h, w, c))
    y = jnp.moveaxis(y, (-5, -4), (-4, -2))         # (..., H, 2, W, 2, C)
    return y.reshape(lead + (2 * h, 2 * w, c))


def upsample2x_align_to_1x2(x: jnp.ndarray) -> jnp.ndarray:
    """x2 align-corners upsample of (..., H, W, C) emitted directly in 1x2
    width-packed layout (..., 2H, W, 2C) — equivalent to
    pack1x2(upsample2x_bilinear_align(x)). H phases interleave by reshape;
    W phases land in dx-major lanes."""
    e0, e1 = _upsample2x_axis_phases(x, -3, True)
    y = jnp.stack([e0, e1], axis=-3)            # (..., H, 2, W, C)
    lead = y.shape[:-4]
    h, w, c = x.shape[-3], x.shape[-2], x.shape[-1]
    y = y.reshape(lead + (2 * h, w, c))
    q0, q1 = _upsample2x_axis_phases(y, -2, True)
    return jnp.concatenate([q0, q1], axis=-1)

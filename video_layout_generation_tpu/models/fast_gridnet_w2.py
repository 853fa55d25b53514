"""1x2 width-packed GridNet executor — the fastest measured row-0 scheme.

Same idea as models/fast_gridnet.py (run the 256px/C=32 row with fuller
MXU lanes via space-to-depth; exact re-indexed kernels), but packing WIDTH
ONLY: row 0 executes as C=64 convs at 256x128. Measured on v5e at the
batch-128 rollout shape this beats the 2x2 scheme 1.28x (3.92 vs 5.00
ms/conv): the 1x2 packed kernel carries 2x logical FLOPs at the C=64 conv
rate (79 TF/s) vs the 2x2 kernel's 4x at the C=128 rate (121 TF/s) — and
dx-major 1x2 packing is a FREE reshape in NHWC (no transposes at the pack/
unpack boundaries, unlike 2x2). Everything stays on the XLA path, so
elementwise fusion (PReLU, grid adds, upsample stencils) is preserved —
the property that beat every Pallas variant (BENCH_NOTES.md).

Rows 1-2 run standard (C=64/96 already efficient at their shapes); the
row-0<->row-1 boundary ops have exact width-packed forms:
``conv_packed1x2_stride2`` (down) and ``upsample2x_align_to_1x2`` (up).

Consumes the SAME flax parameter tree as models/gridnet.GridNet; parity is
tested against ``GridNet.apply`` in fp32 (tests/test_packed_gridnet_w2.py).
Reference capability: src/models/gridnet.py:7-58, src/trainer.py:453-476.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..ops.packed import (conv_packed1x2_dense, conv_packed1x2_insplit,
                          conv_packed1x2_stride2, pack1x2,
                          pack_kernel3x3_1x2, pack_kernel3x3_1x2_insplit,
                          pack_kernel3x3_1x2_stride2, unpack1x2)
from ..ops.resize import upsample2x_align_to_1x2
from .fast_gridnet import (_down_std, _insplit_mode, _lateral_std, _prelu,
                           _up_std)

Dtype = Any


def _conv_w2(xw, wl, b):
    # input-phase split: 1.33x logical FLOPs vs dense 2x, same lanes
    # (ops/packed.pack_kernel3x3_1x2_insplit; VLG_PACKED_INSPLIT=1|concat)
    mode = _insplit_mode()
    if mode == "1":
        ks = [(k.astype(xw.dtype), pd)
              for k, pd in pack_kernel3x3_1x2_insplit(wl)]
        return conv_packed1x2_insplit(xw, ks, b)
    if mode == "concat":
        from ..ops.packed import (conv_packed1x2_insplit_concat,
                                  pack_kernel3x3_1x2_insplit_concat)
        return conv_packed1x2_insplit_concat(
            xw, pack_kernel3x3_1x2_insplit_concat(wl).astype(xw.dtype), b)
    return conv_packed1x2_dense(xw, pack_kernel3x3_1x2(wl).astype(xw.dtype),
                                b)


def _lateral_w2(p, xw, residual=None):
    """LateralBlock on a width-packed tensor; ``residual`` is the grid-
    fusion addend (width-packed, output shape)."""
    y = _prelu(xw, p["PReLU_0"]["alpha"])
    y = _conv_w2(y, p["Conv_0"]["kernel"], p["Conv_0"]["bias"])
    y = _prelu(y, p["PReLU_1"]["alpha"])
    y = _conv_w2(y, p["Conv_1"]["kernel"], p["Conv_1"]["bias"])
    if "Conv_2" in p:
        y = y + _conv_w2(xw, p["Conv_2"]["kernel"], p["Conv_2"]["bias"])
    if residual is not None:
        y = y + residual
    return y


def _down_from_w2(p, xw):
    """DownSamplingBlock: width-packed row-0 input -> standard row-1."""
    dt = xw.dtype
    y = _prelu(xw, p["PReLU_0"]["alpha"])
    y = conv_packed1x2_stride2(
        y, pack_kernel3x3_1x2_stride2(p["Conv_0"]["kernel"]).astype(dt),
        p["Conv_0"]["bias"])
    y = _prelu(y, p["PReLU_1"]["alpha"])
    from .fast_gridnet import _conv_std
    return _conv_std(y, p["Conv_1"]["kernel"], p["Conv_1"]["bias"])


def _up_to_w2(p, x, mode: str = "bilinear"):
    """UpSamplingBlock: standard row-1 input -> width-packed row-0."""
    if mode == "nearest":
        # nearest 2x into w2 space: repeat rows; both width phases copy
        # the source pixel (dx-major packing -> two identical blocks)
        xh = jnp.repeat(x, 2, 1)
        y = jnp.concatenate([xh, xh], axis=-1)
    else:
        y = upsample2x_align_to_1x2(x)
    y = _prelu(y, p["PReLU_0"]["alpha"])
    y = _conv_w2(y, p["Conv_0"]["kernel"], p["Conv_0"]["bias"])
    y = _prelu(y, p["PReLU_1"]["alpha"])
    return _conv_w2(y, p["Conv_1"]["kernel"], p["Conv_1"]["bias"])


def _coords_w2(h: int, w: int, dtype):
    from ..ops.coords import coord_grid
    return pack1x2(coord_grid(h, w, dtype)[None])


def _concat_w2(xw, cw, ci: int, cc: int):
    """Per-phase channel concat of two width-packed tensors."""
    b, h, w, _ = xw.shape
    x2 = xw.reshape(b, h, w, 2, ci)
    c2 = cw.reshape(b, h, w, 2, cc)
    return jnp.concatenate([x2, c2], axis=-1).reshape(b, h, w,
                                                      2 * (ci + cc))


def _coord_lateral_w2(p, xw, cw):
    """CoordLateralBlock (reference src/models/modules.py:115-135) in
    width-packed space: coords appended before every conv, no leading
    PReLU."""
    ci = xw.shape[-1] // 2

    def cconv(name, z, zc):
        return _conv_w2(_concat_w2(z, cw, zc, 2),
                        p[name]["Conv_0"]["kernel"],
                        p[name]["Conv_0"]["bias"])

    y = cconv("CoordConv_0", xw, ci)
    y = _prelu(y, p["PReLU_0"]["alpha"])
    y = cconv("CoordConv_1", y, y.shape[-1] // 2)
    if "CoordConv_2" in p:
        y = y + cconv("CoordConv_2", xw, ci)
    return y


def _grid_w2(P, xw, cw, n_col: int, up_mode: str = "bilinear"):
    """Shared grid body on a width-packed row-0 input; returns packed
    (seg, img) head outputs."""
    if cw is not None:
        x0 = _coord_lateral_w2(P["lateral_in"], xw, cw)
    else:
        x0 = _lateral_w2(P["lateral_in"], xw)
    x1 = _down_from_w2(P["down_00"], x0)
    x2 = _down_std(P["down_10"], x1)
    for i in range(1, n_col):
        C = P[f"col_{i}"]
        if i < n_col / 2:
            x0 = _lateral_w2(C[f"lateral_0{i-1}"], x0)
            x1 = (_down_from_w2(C[f"down_0{i}"], x0)
                  + _lateral_std(C[f"lateral_1{i-1}"], x1))
            x2 = (_down_std(C[f"down_1{i}"], x1)
                  + _lateral_std(C[f"lateral_2{i-1}"], x2))
        else:
            x2 = _lateral_std(C[f"lateral_2{i-1}"], x2)
            x1 = (_up_std(C[f"up_1{i}"], x2, up_mode)
                  + _lateral_std(C[f"lateral_1{i-1}"], x1))
            x0 = _lateral_w2(C[f"lateral_0{i-1}"], x0,
                             residual=_up_to_w2(C[f"up_0{i}"], x1, up_mode))
    segp = _lateral_w2(P["lateral_out_seg"], x0)
    imgp = _lateral_w2(P["lateral_out_img"], x0)
    return segp, imgp


def make_packed_gridnet_apply(dtype: Optional[Dtype] = jnp.bfloat16,
                              n_col: int = 6, coord_in: bool = False,
                              upsample: str = "bilinear"):
    """Build ``apply(variables, x) -> (seg_logits, img)`` matching
    ``GridNet.apply`` (coord_in=True for CoordGridNet's input stem).
    ``upsample`` is explicit-only (see fast_gridnet.make_packed_gridnet_apply)."""

    def apply(variables, x):
        P = variables["params"]
        dt = dtype or x.dtype
        xw = pack1x2(x.astype(dt))
        cw = None
        if coord_in:
            cw = _coords_w2(x.shape[1], x.shape[2], dt)
            cw = jnp.broadcast_to(cw, (x.shape[0],) + cw.shape[1:])
        segp, imgp = _grid_w2(P, xw, cw, n_col, upsample)
        return (unpack1x2(segp).astype(jnp.float32),
                unpack1x2(imgp).astype(jnp.float32))

    return apply


def make_packed_rollout_fn(n_frames: int = 8,
                           dtype: Optional[Dtype] = jnp.bfloat16,
                           coord_in: bool = False, n_col: int = 6,
                           jit: bool = True,
                           upsample: Optional[str] = None,
                           unroll: int = 1):
    """Fully width-packed autoregressive rollout (8-channel contract,
    train/rollout.py semantics): argmax layout feedback, output affine,
    and next-input assembly all stay in packed space; seeds pack once
    (a free reshape), results unpack once (free).

    ``unroll`` is forwarded to ``lax.scan`` (experiment knob: unrolling
    lets XLA fuse a step's argmax/affine epilogue into the next step's
    input assembly at the cost of an ~unroll-times-larger program).

    Returns rollout(variables, img1, img2, seg1, seg2) ->
      imgs (N, T, H, W, 3) normalized, segs (N, T, H, W, 1) float ids.
    """
    from ..train.assemble import OUT_MEAN, OUT_STD
    from .fast_gridnet import _up_mode
    up_mode = _up_mode(upsample)

    def rollout(variables, img1, img2, seg1, seg2):
        P = variables["params"]
        dt = dtype or img1.dtype
        n, h, w, _ = img1.shape
        cw = None
        if coord_in:
            cw = _coords_w2(h, w, dt)
            cw = jnp.broadcast_to(cw, (n,) + cw.shape[1:])
        mean = jnp.tile(jnp.asarray(OUT_MEAN, jnp.float32), 2)
        std = jnp.tile(jnp.asarray(OUT_STD, jnp.float32), 2)

        def to_p(x):
            return pack1x2(x.astype(dt))

        def step(carry, _):
            f_old, f_new, s_old, s_new = carry          # all width-packed
            b, hh, ww, _ = f_old.shape
            parts = (s_old.reshape(b, hh, ww, 2, 1),
                     f_old.reshape(b, hh, ww, 2, 3),
                     f_new.reshape(b, hh, ww, 2, 3),
                     s_new.reshape(b, hh, ww, 2, 1))
            xw = jnp.concatenate(parts, axis=-1).reshape(b, hh, ww, 16)
            segp, imgp = _grid_w2(P, xw, cw, n_col, up_mode)
            imgp = ((imgp.astype(jnp.float32) - mean) / std).astype(dt)
            seg_out = segp.shape[-1] // 2
            ids = jnp.argmax(
                segp.reshape(b, hh, ww, 2, seg_out).astype(jnp.float32),
                axis=-1)
            segp_next = ids.reshape(b, hh, ww, 2).astype(dt)
            return (f_new, imgp, s_new, segp_next), (imgp, segp_next)

        carry0 = (to_p(img1), to_p(img2), to_p(seg1), to_p(seg2))
        _, (imgs_p, segs_p) = jax.lax.scan(step, carry0, None,
                                           length=n_frames, unroll=unroll)
        t = imgs_p.shape[0]
        imgs = unpack1x2(imgs_p.reshape((t * n,) + imgs_p.shape[2:]))
        segs = unpack1x2(segs_p.reshape((t * n,) + segs_p.shape[2:]))
        imgs = imgs.reshape(t, n, h, w, 3).astype(jnp.float32)
        segs = segs.reshape(t, n, h, w, 1).astype(jnp.float32)
        return jnp.moveaxis(imgs, 0, 1), jnp.moveaxis(segs, 0, 1)

    from .fast_gridnet import rollout_jit
    return rollout_jit(rollout) if jit else rollout

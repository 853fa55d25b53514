"""Packed-execution GridNet — an optimized inference executor.

Runs the exact GridNet computation (models/gridnet.py) from the *same*
flax parameter tree, but executes the 256px / 32-channel row in 2x2
space-to-depth packed form (ops/packed.py): row-0 convs become 128-channel
convs at 128px, which the MXU runs ~10x more efficiently (measured
15 -> 152 TFLOP/s on v5e). Rows 1-2 (64/96 channels at 128/64px) run
standard. Used by the rollout/serving path; training keeps the flax module
(autodiff through the packed kernels would also work, but the plain model
is the source of truth for grads).

Numerics: identical graph up to bf16 rounding — the kernel repacking is an
exact re-indexing; parity is tested against ``GridNet.apply`` in fp32.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..ops.packed import (conv_packed3x3, conv_packed3x3_dense,
                          conv_packed3x3_insplit, conv_packed_stride2,
                          pack2x2, pack_kernel3x3, pack_kernel3x3_insplit,
                          pack_kernel3x3_stride2, packed_upsample2x_align,
                          unpack2x2)
from ..ops.resize import upsample2x_bilinear_align

Dtype = Any


def _prelu(x, alpha):
    a = jnp.asarray(alpha, x.dtype)
    return jnp.where(x >= 0, x, a * x)


def rollout_jit(fn, **jit_kw):
    """jit with the rollout's tuned TPU compile options: a 96MB scoped-vmem
    budget measured +1.4% over the 16MB default on the full b128 rollout
    (larger conv fusions; tools/xla_flag_sweep.py). CPU and other backends
    get a plain jit (the TPU option would be rejected)."""
    if jax.default_backend() in ("tpu", "axon"):
        jit_kw = dict(jit_kw, compiler_options={
            "xla_tpu_scoped_vmem_limit_kib": "98304"})
    return jax.jit(fn, **jit_kw)


def _conv_std(x, w, b, stride=1):
    if (stride == 1 and w.shape[0] == 3 and w.shape[1] == 3
            and _use_w1x2(x.shape, w.shape)):
        from ..ops.pallas.conv1x2 import conv3x3_w1x2
        return conv3x3_w1x2(x, w.astype(x.dtype), b)
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)
    return y + b.astype(y.dtype)


def _use_w1x2(xshape, wshape) -> bool:
    """Route C=64-class rows through the 1x2 width-packed sparse kernel
    (ops/pallas/conv1x2.py). OPT-IN via VLG_W1X2=1: at the rollout row-1
    shape (batch 128 @128px) XLA's C=64 conv reaches 79 TF/s and the 1x2
    kernel measured 0.69x of it — the kernel only wins at training-step
    shapes (b16 @256px: 1.26x), where HNED/VGG use it directly."""
    import os
    if os.environ.get("VLG_W1X2", "0") != "1":
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    return (xshape[2] % 2 == 0 and (2 * wshape[2]) % 128 == 0
            and (2 * wshape[3]) % 128 == 0)


def _lateral_std(p, x):
    y = _prelu(x, p["PReLU_0"]["alpha"])
    y = _conv_std(y, p["Conv_0"]["kernel"], p["Conv_0"]["bias"])
    y = _prelu(y, p["PReLU_1"]["alpha"])
    y = _conv_std(y, p["Conv_1"]["kernel"], p["Conv_1"]["bias"])
    if "Conv_2" in p:
        y = y + _conv_std(x, p["Conv_2"]["kernel"], p["Conv_2"]["bias"])
    return y


def _sparse_fused_on() -> bool:
    """Whether the fused sparse Pallas path runs (TPU backends only;
    OPT-IN via VLG_PACKED_SPARSE=1 — measured slower end to end than the
    fully-fusable XLA dense path; see ops/packed._use_sparse_kernel)."""
    import os
    return (os.environ.get("VLG_PACKED_SPARSE", "0") == "1"
            and jax.default_backend() in ("tpu", "axon"))


def _fused_lateral_on() -> bool:
    """Whole-lateral fused Pallas kernel (ops/pallas/conv_packed.py:
    fused_lateral_packed3x3) — OPT-IN via VLG_FUSED_LATERAL=1 while being
    A/B'd on hardware."""
    import os
    return (os.environ.get("VLG_FUSED_LATERAL", "0") == "1"
            and jax.default_backend() in ("tpu", "axon"))


def _insplit_mode() -> str:
    """Input-phase-split packed convs (ops/packed.pack_kernel3x3_insplit):
    1.78x logical FLOPs vs the one-shot dense (3,3,4C,4Co) form's 4x, full
    128 output lanes. OPT-IN while being A/B'd on hardware (exactness:
    tests/test_packed_insplit.py). VLG_PACKED_INSPLIT: "1" = four summed
    (2,2,C,4Co) convs; "concat" = shifted-concat input + ONE (2,2,4C,4Co)
    VALID conv (same FLOPs, no partial-sum HBM traffic); "0"/unset =
    dense."""
    import os
    mode = os.environ.get("VLG_PACKED_INSPLIT", "0")
    if mode not in ("0", "1", "concat"):
        raise ValueError(f"VLG_PACKED_INSPLIT must be '0', '1' or "
                         f"'concat', got {mode!r}")
    return mode


def _insplit_on() -> bool:
    return _insplit_mode() != "0"


def _pconv3x3(x, w_logical, bias, dt):
    """Stride-1 packed conv from the LOGICAL (3,3,Ci,Co) kernel — dispatch
    point for the dense / input-phase-split XLA forms (Pallas variants keep
    their own pre-packed branches above their call sites)."""
    mode = _insplit_mode()
    if mode == "1":
        ks = [(k.astype(dt), pad)
              for k, pad in pack_kernel3x3_insplit(w_logical)]
        return conv_packed3x3_insplit(x, ks, bias)
    if mode == "concat":
        from ..ops.packed import (conv_packed3x3_insplit_concat,
                                  pack_kernel3x3_insplit_concat)
        return conv_packed3x3_insplit_concat(
            x, pack_kernel3x3_insplit_concat(w_logical).astype(dt), bias)
    return conv_packed3x3(x, pack_kernel3x3(w_logical).astype(dt), bias)


def _lateral_packed(p, xp, residual=None):
    """LateralBlock in packed row-0 space. ``residual`` (packed, output
    shape) is the grid-fusion addend — fused into the final conv's f32
    epilogue on the Pallas path, added after on the XLA path."""
    dt = xp.dtype
    w0 = pack_kernel3x3(p["Conv_0"]["kernel"]).astype(dt)
    w1 = pack_kernel3x3(p["Conv_1"]["kernel"]).astype(dt)
    if (_fused_lateral_on() and "Conv_2" not in p
            and xp.shape[-1] % 128 == 0
            and w0.shape[-1] == xp.shape[-1]
            and w1.shape[-1] == xp.shape[-1]):
        from ..ops.pallas.conv_packed import fused_lateral_packed3x3
        return fused_lateral_packed3x3(
            xp, w0, p["Conv_0"]["bias"], p["PReLU_0"]["alpha"],
            w1, p["Conv_1"]["bias"], p["PReLU_1"]["alpha"], residual)
    if (_sparse_fused_on() and xp.shape[-1] % 128 == 0
            and w0.shape[-1] % 128 == 0 and w1.shape[-1] % 128 == 0):
        from ..ops.pallas.conv_packed import (prelu_conv_packed3x3,
                                              prelu_conv_packed3x3_res)
        y = prelu_conv_packed3x3(xp, w0, p["Conv_0"]["bias"],
                                 p["PReLU_0"]["alpha"])
        s = residual
        if "Conv_2" in p:
            sc = conv_packed3x3(
                xp, pack_kernel3x3(p["Conv_2"]["kernel"]).astype(dt),
                p["Conv_2"]["bias"])
            s = sc if s is None else s + sc
        if s is None:
            return prelu_conv_packed3x3(y, w1, p["Conv_1"]["bias"],
                                        p["PReLU_1"]["alpha"])
        return prelu_conv_packed3x3_res(y, w1, p["Conv_1"]["bias"],
                                        p["PReLU_1"]["alpha"], s)
    y = _prelu(xp, p["PReLU_0"]["alpha"])
    y = _pconv3x3(y, p["Conv_0"]["kernel"], p["Conv_0"]["bias"], dt)
    y = _prelu(y, p["PReLU_1"]["alpha"])
    y = _pconv3x3(y, p["Conv_1"]["kernel"], p["Conv_1"]["bias"], dt)
    if "Conv_2" in p:
        y = y + _pconv3x3(xp, p["Conv_2"]["kernel"], p["Conv_2"]["bias"],
                          dt)
    if residual is not None:
        y = y + residual
    return y


def _down_from_packed(p, xp):
    """DownSamplingBlock whose input lives in packed row-0 space."""
    dt = xp.dtype
    y = _prelu(xp, p["PReLU_0"]["alpha"])
    y = conv_packed_stride2(
        y, pack_kernel3x3_stride2(p["Conv_0"]["kernel"]).astype(dt),
        p["Conv_0"]["bias"])
    y = _prelu(y, p["PReLU_1"]["alpha"])
    return _conv_std(y, p["Conv_1"]["kernel"], p["Conv_1"]["bias"])


def _down_std(p, x):
    y = _prelu(x, p["PReLU_0"]["alpha"])
    y = _conv_std(y, p["Conv_0"]["kernel"], p["Conv_0"]["bias"], stride=2)
    y = _prelu(y, p["PReLU_1"]["alpha"])
    return _conv_std(y, p["Conv_1"]["kernel"], p["Conv_1"]["bias"])


def _up_mode(upsample: Optional[str]) -> str:
    """Rollout upsample mode. "bilinear" (default) is exact reference math
    (src/models/modules.py:50 align_corners bilinear); "nearest" is an
    OPT-IN approximation — the stencil blends are ~14% of the b128 rollout
    (BENCH_NOTES.md cost map) and edge-map/layout feedback is robust to the
    interpolation kernel. Precedence: VLG_ROLLOUT_UP env > per-call arg >
    "bilinear". Applies to the rollout executors only; train/eval applies
    always use bilinear."""
    import os
    chosen = os.environ.get("VLG_ROLLOUT_UP") or upsample or "bilinear"
    if chosen not in ("bilinear", "nearest"):
        raise ValueError(
            f"rollout upsample must be 'bilinear' or 'nearest', "
            f"got {chosen!r}")
    return chosen


def _up_std(p, x, mode: str = "bilinear"):
    if mode == "nearest":
        y = jnp.repeat(jnp.repeat(x, 2, 1), 2, 2)
    else:
        y = upsample2x_bilinear_align(x)
    y = _prelu(y, p["PReLU_0"]["alpha"])
    y = _conv_std(y, p["Conv_0"]["kernel"], p["Conv_0"]["bias"])
    y = _prelu(y, p["PReLU_1"]["alpha"])
    return _conv_std(y, p["Conv_1"]["kernel"], p["Conv_1"]["bias"])


def _up_to_packed(p, x, mode: str = "bilinear"):
    """UpSamplingBlock producing packed row-0 output: packed upsample then
    packed convs.

    The upsample is the banded-stencil form (ops/packed.py) — pure
    elementwise blends that XLA fuses into the following DENSE conv, so by
    default this block stays entirely on the XLA path even when the
    laterals run Pallas (measured: stencil+dense 823 fps vs stencil+Pallas
    483 — a pallas_call boundary forces the blend chain to materialize).
    VLG_SPARSE_UP=1 re-enables the fused kernels here for experiments."""
    import os
    dt = x.dtype
    if mode == "nearest":
        # nearest 2x in packed space: all four spatial phases copy the
        # source pixel -> four identical channel blocks (phase-major)
        y = jnp.concatenate([x, x, x, x], axis=-1)
    else:
        y = packed_upsample2x_align(x)
    w0 = pack_kernel3x3(p["Conv_0"]["kernel"]).astype(dt)
    w1 = pack_kernel3x3(p["Conv_1"]["kernel"]).astype(dt)
    if (os.environ.get("VLG_SPARSE_UP", "0") == "1" and _sparse_fused_on()
            and y.shape[-1] % 128 == 0
            and w0.shape[-1] % 128 == 0 and w1.shape[-1] % 128 == 0):
        from ..ops.pallas.conv_packed import prelu_conv_packed3x3
        y = prelu_conv_packed3x3(y, w0, p["Conv_0"]["bias"],
                                 p["PReLU_0"]["alpha"])
        return prelu_conv_packed3x3(y, w1, p["Conv_1"]["bias"],
                                    p["PReLU_1"]["alpha"])
    y = _prelu(y, p["PReLU_0"]["alpha"])
    if _insplit_on():
        y = _pconv3x3(y, p["Conv_0"]["kernel"], p["Conv_0"]["bias"], dt)
        y = _prelu(y, p["PReLU_1"]["alpha"])
        return _pconv3x3(y, p["Conv_1"]["kernel"], p["Conv_1"]["bias"], dt)
    y = conv_packed3x3_dense(y, w0, p["Conv_0"]["bias"])
    y = _prelu(y, p["PReLU_1"]["alpha"])
    return conv_packed3x3_dense(y, w1, p["Conv_1"]["bias"])


def _concat_packed(xp, cp, ci: int, cc: int):
    """Concat packed tensors per phase: pack(concat(x, c)) from pack(x),
    pack(c)."""
    b, h, w, _ = xp.shape
    x4 = xp.reshape(b, h, w, 4, ci)
    c4 = cp.reshape(b, h, w, 4, cc)
    return jnp.concatenate([x4, c4], axis=-1).reshape(b, h, w, 4 * (ci + cc))


def _coords_packed(h2: int, w2: int, dtype):
    """pack2x2 of the CoordConv coordinate channels at (h2, w2) — shares
    the grid builder with ops/coords.add_coord_channels so the packed
    executor cannot drift from the flax CoordConv convention."""
    from ..ops.coords import coord_grid
    return pack2x2(coord_grid(h2, w2, dtype)[None])


def _coord_lateral_packed(p, xp, cp):
    """CoordLateralBlock (reference src/models/modules.py:115-135) in packed
    space: coords appended before every conv; no leading PReLU."""
    dt = xp.dtype
    ci = xp.shape[-1] // 4

    def cconv(name, z, zc):
        return _pconv3x3(_concat_packed(z, cp, zc, 2),
                         p[name]["Conv_0"]["kernel"],
                         p[name]["Conv_0"]["bias"], dt)

    y = cconv("CoordConv_0", xp, ci)
    y = _prelu(y, p["PReLU_0"]["alpha"])
    co = y.shape[-1] // 4
    y = cconv("CoordConv_1", y, co)
    if "CoordConv_2" in p:
        y = y + cconv("CoordConv_2", xp, ci)
    return y


def _row0_packing(packing, default):
    """Which space-to-depth scheme runs row 0. Measured on v5e: "1x2"
    (width-only, free reshape) wins the forward-only rollout at large
    batch (924 vs 812 fps at b128) and ties at b<=4, while "2x2" wins the
    mid-batch rollout (b8-b64 by 17-28% — BENCH_NOTES batch sweep) and the
    TRAINING step (135.5 vs 153.4 ms/step at b16 — the 1x2 conv's VJP is
    slower). The rollout entry defaults to "auto" (per-call batch
    dispatch); the apply entry (train/eval) to "2x2". Precedence:
    VLG_ROW0_PACK env (user override, wins everywhere) > per-call
    ``packing`` (code-level choice) > the entry default."""
    import os
    env = os.environ.get("VLG_ROW0_PACK")
    if env == "auto":
        # "auto" IS the rollout default; treating it as a forced value
        # would recurse through the dispatcher's explicit inner choices
        env = None
    chosen = env or packing or default
    if chosen not in ("1x2", "2x2", "auto"):
        raise ValueError(f"VLG_ROW0_PACK/packing must be '1x2', '2x2' or "
                         f"'auto', got {chosen!r}")
    return chosen


def make_packed_gridnet_apply(dtype: Optional[Dtype] = jnp.bfloat16,
                              n_col: int = 6, coord_in: bool = False,
                              packing: Optional[str] = None,
                              upsample: str = "bilinear"):
    """Build ``apply(variables, x) -> (seg_logits, img)`` matching
    ``GridNet.apply`` (coord_in=True for CoordGridNet's input stem).

    ``upsample`` is an EXPLICIT parameter (no env override, unlike the
    rollout factories): train/eval applies must stay on the exact bilinear
    path; only rollout consumers may pass "nearest"."""
    if upsample not in ("bilinear", "nearest"):
        raise ValueError(f"upsample must be 'bilinear' or 'nearest', "
                         f"got {upsample!r}")
    if _row0_packing(packing, "2x2") == "1x2":
        from . import fast_gridnet_w2
        return fast_gridnet_w2.make_packed_gridnet_apply(
            dtype=dtype, n_col=n_col, coord_in=coord_in, upsample=upsample)

    def apply(variables, x):
        P = variables["params"]
        dt = dtype or x.dtype
        xp = pack2x2(x.astype(dt))

        if coord_in:
            cp = _coords_packed(x.shape[1], x.shape[2], dt)
            cp = jnp.broadcast_to(cp, (x.shape[0],) + cp.shape[1:])
            x0 = _coord_lateral_packed(P["lateral_in"], xp, cp)
        else:
            x0 = _lateral_packed(P["lateral_in"], xp)       # packed 256px row
        x1 = _down_from_packed(P["down_00"], x0)            # 128px
        x2 = _down_std(P["down_10"], x1)                    # 64px

        for i in range(1, n_col):
            C = P[f"col_{i}"]
            if i < n_col / 2:
                x0 = _lateral_packed(C[f"lateral_0{i-1}"], x0)
                x1 = (_down_from_packed(C[f"down_0{i}"], x0)
                      + _lateral_std(C[f"lateral_1{i-1}"], x1))
                x2 = (_down_std(C[f"down_1{i}"], x1)
                      + _lateral_std(C[f"lateral_2{i-1}"], x2))
            else:
                x2 = _lateral_std(C[f"lateral_2{i-1}"], x2)
                x1 = (_up_std(C[f"up_1{i}"], x2, upsample)
                      + _lateral_std(C[f"lateral_1{i-1}"], x1))
                x0 = _lateral_packed(C[f"lateral_0{i-1}"], x0,
                                     residual=_up_to_packed(C[f"up_0{i}"],
                                                            x1, upsample))

        seg = unpack2x2(_lateral_packed(P["lateral_out_seg"], x0))
        img = unpack2x2(_lateral_packed(P["lateral_out_img"], x0))
        return seg.astype(jnp.float32), img.astype(jnp.float32)

    return apply


def make_edge_rollout_apply(dtype: Optional[Dtype] = jnp.bfloat16,
                            n_col: int = 6, coord_in: bool = False,
                            upsample: str = "bilinear"):
    """Batch-adaptive packed apply for the EDGE-mode rollout (HNED edges
    recomputed per generated frame, so the feedback loop can't stay in
    packed space and the rollout drives a per-frame ``apply``).

    v5e edge-mode batch sweep (256px, 8 frames — BENCH_NOTES round 2):
    2x2 wins b32-b64 by 12-14% (444.5 vs 391.5 fps at b32, 462.7 vs 412.3
    at b64), 1x2 wins b8 (332.0 vs 293.7) and b128 (710.7 vs 625.3), tie
    at b16. Batch is static under jit, so the dispatch resolves at trace
    time and only the used scheme compiles. VLG_ROW0_PACK still overrides
    both inner choices (both branches then build the same scheme)."""
    kw = dict(dtype=dtype, n_col=n_col, coord_in=coord_in,
              upsample=upsample)
    ap_w2 = make_packed_gridnet_apply(packing="1x2", **kw)
    ap_22 = make_packed_gridnet_apply(packing="2x2", **kw)

    def apply(variables, x):
        ap = ap_22 if 32 <= x.shape[0] <= 64 else ap_w2
        return ap(variables, x)

    return apply


def make_packed_rollout_fn(n_frames: int = 8,
                           dtype: Optional[Dtype] = jnp.bfloat16,
                           coord_in: bool = False, n_col: int = 6,
                           jit: bool = True, packing: Optional[str] = None,
                           upsample: Optional[str] = None,
                           unroll: int = 1):
    """Fully-packed autoregressive rollout (8-channel contract,
    train/rollout.py semantics): the feedback loop — argmax layout, output
    normalization, next-input assembly — stays in packed space, so the scan
    body never round-trips through the 256px layout. Seeds pack once;
    results unpack once at the end.

    Returns rollout(variables, img1, img2, seg1, seg2) ->
      imgs (N, T, H, W, 3) normalized, segs (N, T, H, W, 1) float ids.
    """
    chosen = _row0_packing(packing, "auto")
    if chosen == "auto":
        # batch-adaptive scheme dispatch (measured v5e crossover: 2x2 wins
        # b8-b64, 1x2 wins b>=128 and ties b<=4 — BENCH_NOTES batch
        # sweep). Each inner fn jits lazily, so only the used scheme
        # compiles.
        kw = dict(n_frames=n_frames, dtype=dtype, coord_in=coord_in,
                  n_col=n_col, jit=jit, upsample=upsample, unroll=unroll)
        ro_w2 = make_packed_rollout_fn(packing="1x2", **kw)
        ro_22 = make_packed_rollout_fn(packing="2x2", **kw)

        def rollout_auto(variables, img1, img2, seg1, seg2):
            ro = ro_22 if 8 <= img1.shape[0] <= 64 else ro_w2
            return ro(variables, img1, img2, seg1, seg2)

        return rollout_auto
    if chosen == "1x2":
        from . import fast_gridnet_w2
        return fast_gridnet_w2.make_packed_rollout_fn(
            n_frames=n_frames, dtype=dtype, coord_in=coord_in, n_col=n_col,
            jit=jit, upsample=upsample, unroll=unroll)
    from ..train.assemble import OUT_MEAN, OUT_STD

    up_mode = _up_mode(upsample)

    # run the grid on an already-packed input and emit packed heads
    def core_packed(P, xp, cp):
        dt = dtype or xp.dtype
        if coord_in:
            x0 = _coord_lateral_packed(P["lateral_in"], xp, cp)
        else:
            x0 = _lateral_packed(P["lateral_in"], xp)
        x1 = _down_from_packed(P["down_00"], x0)
        x2 = _down_std(P["down_10"], x1)
        for i in range(1, n_col):
            C = P[f"col_{i}"]
            if i < n_col / 2:
                x0 = _lateral_packed(C[f"lateral_0{i-1}"], x0)
                x1 = (_down_from_packed(C[f"down_0{i}"], x0)
                      + _lateral_std(C[f"lateral_1{i-1}"], x1))
                x2 = (_down_std(C[f"down_1{i}"], x1)
                      + _lateral_std(C[f"lateral_2{i-1}"], x2))
            else:
                x2 = _lateral_std(C[f"lateral_2{i-1}"], x2)
                x1 = (_up_std(C[f"up_1{i}"], x2, up_mode)
                      + _lateral_std(C[f"lateral_1{i-1}"], x1))
                x0 = _lateral_packed(C[f"lateral_0{i-1}"], x0,
                                     residual=_up_to_packed(C[f"up_0{i}"],
                                                            x1, up_mode))
        segp = _lateral_packed(P["lateral_out_seg"], x0)   # (.., 4*seg_out)
        imgp = _lateral_packed(P["lateral_out_img"], x0)   # (.., 4*3)
        return segp, imgp

    def rollout(variables, img1, img2, seg1, seg2):
        P = variables["params"]
        dt = dtype or img1.dtype
        n, h, w, _ = img1.shape
        cp = None
        if coord_in:
            cp = _coords_packed(h, w, dt)
            cp = jnp.broadcast_to(cp, (n,) + cp.shape[1:])
        mean = jnp.tile(jnp.asarray(OUT_MEAN, jnp.float32), 4)
        std = jnp.tile(jnp.asarray(OUT_STD, jnp.float32), 4)

        def to_p(x):
            return pack2x2(x.astype(dt))

        def step(carry, _):
            f_old, f_new, s_old, s_new = carry          # all packed
            # phase-interleaved concat [seg_old, img_old, img_new, seg_new]
            b, hh, ww, _ = f_old.shape
            parts = (s_old.reshape(b, hh, ww, 4, 1),
                     f_old.reshape(b, hh, ww, 4, 3),
                     f_new.reshape(b, hh, ww, 4, 3),
                     s_new.reshape(b, hh, ww, 4, 1))
            xp = jnp.concatenate(parts, axis=-1).reshape(b, hh, ww, 32)
            segp, imgp = core_packed(P, xp, cp)
            # per-phase output normalization (OUT affine) in packed space
            imgp = ((imgp.astype(jnp.float32) - mean) / std).astype(dt)
            # per-phase argmax over the seg_out classes
            seg_out = segp.shape[-1] // 4
            ids = jnp.argmax(
                segp.reshape(b, hh, ww, 4, seg_out).astype(jnp.float32),
                axis=-1)
            segp_next = ids.reshape(b, hh, ww, 4).astype(dt)
            return (f_new, imgp, s_new, segp_next), (imgp, segp_next)

        carry0 = (to_p(img1), to_p(img2), to_p(seg1), to_p(seg2))
        _, (imgs_p, segs_p) = jax.lax.scan(step, carry0, None,
                                           length=n_frames, unroll=unroll)
        # (T, N, hh, ww, pc) -> unpack -> (N, T, H, W, c)
        t = imgs_p.shape[0]
        imgs = unpack2x2(imgs_p.reshape((t * n,) + imgs_p.shape[2:]))
        segs = unpack2x2(segs_p.reshape((t * n,) + segs_p.shape[2:]))
        imgs = imgs.reshape(t, n, h, w, 3).astype(jnp.float32)
        segs = segs.reshape(t, n, h, w, 1).astype(jnp.float32)
        return jnp.moveaxis(imgs, 0, 1), jnp.moveaxis(segs, 0, 1)

    return rollout_jit(rollout) if jit else rollout

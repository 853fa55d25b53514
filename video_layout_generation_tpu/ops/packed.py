"""Space-to-depth (2x2) packed convolution transforms.

Why: GridNet's hot row runs 3x3 convs with 32 channels at 256px. On the MXU
an NHWC conv with C_out=32 uses 32/128 output lanes — measured ~15 TFLOP/s
vs ~152 TFLOP/s for C=128 at the same byte volume. Packing 2x2 spatial
blocks into channels (256^2 x C -> 128^2 x 4C) turns those convs into
128-channel convs that run near MXU peak; the 3x3 stride-1 conv and the 3x3
stride-2 conv both have *exact* packed-space equivalents with restructured
kernels, so results are bit-identical in exact arithmetic.

Derivation (per axis): output pixel 2i+e (phase e in {0,1}), kernel tap k in
{0,1,2}, input pixel 2i+e+k-1 = 2(i+q)+d with packed phase d in {0,1} and
spatial shift q = (e+k-1-d)/2 — so
  stride-1: k = 2q+1+d-e, q in {-1,0,1}  -> packed kernel is 3x3,
  stride-2 (unpacked output at half res): k = 2q+d+1, q in {-1,0}
            -> packed kernel is 2x2 with ((1,0),(1,0)) padding.

Channel order: phase-major — packed channel = (dy*2+dx)*C + c, so biases
tile with ``jnp.tile(b, 4)``.

These transforms run at trace time on the *logical* parameters; the packed
executor (models/fast_gridnet.py) therefore consumes standard checkpoints.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def pack2x2(x: jnp.ndarray) -> jnp.ndarray:
    """(B, 2H, 2W, C) -> (B, H, W, 4C), phase-major channels."""
    b, h2, w2, c = x.shape
    h, w = h2 // 2, w2 // 2
    y = x.reshape(b, h, 2, w, 2, c)
    y = y.transpose(0, 1, 3, 2, 4, 5)      # B,H,W,dy,dx,C
    return y.reshape(b, h, w, 4 * c)


def unpack2x2(y: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 4C) -> (B, 2H, 2W, C)."""
    b, h, w, c4 = y.shape
    c = c4 // 4
    x = y.reshape(b, h, w, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)      # B,H,dy,W,dx,C
    return x.reshape(b, 2 * h, 2 * w, c)


def _axis_taps_s1():
    """(e, d) -> [(q, k)] for the stride-1 identity k = 2q+1+d-e."""
    taps = {}
    for e in (0, 1):
        for d in (0, 1):
            lst = []
            for q in (-1, 0, 1):
                k = 2 * q + 1 + d - e
                if 0 <= k <= 2:
                    lst.append((q, k))
            taps[(e, d)] = lst
    return taps


def _axis_taps_s2():
    """(d,) -> [(q, k)] for the stride-2 identity k = 2q+d+1."""
    taps = {}
    for d in (0, 1):
        lst = []
        for q in (-1, 0):
            k = 2 * q + d + 1
            if 0 <= k <= 2:
                lst.append((q, k))
        taps[d] = lst
    return taps


def pack_kernel3x3(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,Ci,Co) logical kernel -> (3,3,4Ci,4Co) packed-space kernel."""
    _, _, ci, co = w.shape
    taps = _axis_taps_s1()
    out = jnp.zeros((3, 3, 4 * ci, 4 * co), w.dtype)
    for ey in (0, 1):
        for ex in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    for qy, ky in taps[(ey, dy)]:
                        for qx, kx in taps[(ex, dx)]:
                            ic = (dy * 2 + dx) * ci
                            oc = (ey * 2 + ex) * co
                            out = out.at[qy + 1, qx + 1, ic:ic + ci,
                                         oc:oc + co].set(w[ky, kx])
    return out


def pack_kernel3x3_stride2(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,Ci,Co) stride-2 logical kernel -> (2,2,4Ci,Co) packed kernel.

    Apply with stride 1 and padding ((1,0),(1,0)) on the packed input; the
    output is already at the downsampled (unpacked) resolution.
    """
    _, _, ci, co = w.shape
    taps = _axis_taps_s2()
    out = jnp.zeros((2, 2, 4 * ci, co), w.dtype)
    for dy in (0, 1):
        for dx in (0, 1):
            for qy, ky in taps[dy]:
                for qx, kx in taps[dx]:
                    ic = (dy * 2 + dx) * ci
                    out = out.at[qy + 1, qx + 1, ic:ic + ci, :].set(
                        w[ky, kx])
    return out


def pack_kernel3x3_insplit(w: jnp.ndarray):
    """Input-phase-split decomposition of the packed stride-1 conv.

    The one-shot packed kernel (pack_kernel3x3) is (3,3,4Ci,4Co): 36·Ci·Co
    MACs per logical output pixel against the true 9·Ci·Co — 4x structural
    FLOP inflation (the 3x3 packed support is the UNION of the four output
    phases' 2x2 supports). Splitting by OUTPUT phase removes the zeros but
    lands at Co=32 output lanes (~1/4 MXU utilization — round-2 negative).

    Splitting by INPUT phase d=(dy,dx) instead keeps full lanes: for a fixed
    input phase, the stride-1 tap identity k = 2q+1+d-e gives each axis at
    most TWO valid shifts q (d=0 -> q in {0,1}; d=1 -> q in {-1,0}), so each
    input phase contributes a dense-support (2,2,Ci,4Co) kernel carrying
    exactly its 9 redistributed logical taps. Four such convs (summed) do
    16·Ci·Co MACs per output pixel — 1.78x instead of 4x — with 4Co=128
    output lanes and a 2·2·Ci=128 contraction at Ci=32.

    Returns [(kernel (2,2,Ci,4Co), ((py_lo,py_hi),(px_lo,px_hi))), ...] in
    phase-major input order; apply with ``conv_packed3x3_insplit``.
    """
    _, _, ci, co = w.shape
    # built with traceable jnp placement (no numpy) so packing can run
    # either eagerly on concrete params or inside an enclosing jit
    zero = jnp.zeros((ci, co), w.dtype)
    out = []
    for dy in (0, 1):
        qys = (0, 1) if dy == 0 else (-1, 0)
        for dx in (0, 1):
            qxs = (0, 1) if dx == 0 else (-1, 0)

            def tap(qy, qx, ey, ex, dy=dy, dx=dx):
                ky = 2 * qy + 1 + dy - ey
                kx = 2 * qx + 1 + dx - ex
                if 0 <= ky <= 2 and 0 <= kx <= 2:
                    return w[ky, kx]
                return zero

            k = jnp.stack([
                jnp.stack([
                    jnp.concatenate(
                        [tap(qy, qx, ey, ex)
                         for ey in (0, 1) for ex in (0, 1)], axis=-1)
                    for qx in qxs], axis=0)
                for qy in qys], axis=0)
            # out[p] = sum_k x[p + k - pad_lo] w[k]; we need x[p + q],
            # q = k + qys[0]  ->  pad_lo = -qys[0], pad_hi = 1 + qys[0]
            pad = (((0, 1) if dy == 0 else (1, 0)),
                   ((0, 1) if dx == 0 else (1, 0)))
            out.append((k, pad))
    return out


def conv_packed3x3_insplit(x: jnp.ndarray, kernels,
                           bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """Sum of four input-phase convs (pack_kernel3x3_insplit); exact
    packed-space stride-1 conv at 1.78x logical FLOPs (vs dense 4x)."""
    c = x.shape[-1] // 4
    y = None
    for d, (k, pad) in enumerate(kernels):
        yi = jax.lax.conv_general_dilated(
            x[..., d * c:(d + 1) * c], k.astype(x.dtype), (1, 1), list(pad),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype)
        y = yi if y is None else y + yi
    if bias is not None:
        y = y + jnp.tile(bias, 4).astype(y.dtype)
    return y


def pack_kernel3x3_insplit_concat(w: jnp.ndarray) -> jnp.ndarray:
    """Single-conv realization of the input-phase split: the four
    (2,2,Ci,4Co) phase kernels stacked on the input-channel axis into ONE
    (2,2,4Ci,4Co) kernel, applied VALID to the shifted-concat input built
    by ``insplit_concat_input`` — same 1.78x logical FLOPs as the summed
    form but one conv and no partial-sum HBM traffic (the shifted concat
    is one fused pad+concat materialization instead)."""
    ks = pack_kernel3x3_insplit(w)
    return jnp.concatenate([k for k, _ in ks], axis=2)


def insplit_concat_input(x: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W,4C) packed input -> (B,H+1,W+1,4C) where each input phase
    d=(dy,dx) is shifted so its two valid taps align to a common VALID
    (2,2) window: z_d[i] = x_d[i + q0_d] with q0 = 0 for d=0 (pad after)
    and -1 for d=1 (pad before), per axis."""
    c = x.shape[-1] // 4
    groups = []
    for dy in (0, 1):
        py = (0, 1) if dy == 0 else (1, 0)
        for dx in (0, 1):
            px = (0, 1) if dx == 0 else (1, 0)
            d = dy * 2 + dx
            groups.append(jnp.pad(x[..., d * c:(d + 1) * c],
                                  ((0, 0), py, px, (0, 0))))
    return jnp.concatenate(groups, axis=-1)


def conv_packed3x3_insplit_concat(x: jnp.ndarray, w_ic: jnp.ndarray,
                                  bias: jnp.ndarray | None = None
                                  ) -> jnp.ndarray:
    """Exact packed stride-1 conv: shifted-concat input + one VALID (2,2)
    conv (pack_kernel3x3_insplit_concat)."""
    z = insplit_concat_input(x)
    y = jax.lax.conv_general_dilated(
        z, w_ic.astype(x.dtype), (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)
    if bias is not None:
        y = y + jnp.tile(bias, 4).astype(y.dtype)
    return y


def pack_kernel3x3_1x2_insplit_concat(w: jnp.ndarray) -> jnp.ndarray:
    """1x2 analog of pack_kernel3x3_insplit_concat: ONE (3,2,2Ci,2Co)
    kernel over the column-shifted concat input (1.33x logical FLOPs)."""
    ks = pack_kernel3x3_1x2_insplit(w)
    return jnp.concatenate([k for k, _ in ks], axis=2)


def insplit_concat_input_1x2(x: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W,2C) width-packed input -> (B,H,W+1,2C) with the two column
    phases shifted to a common VALID 2-tap column window."""
    c = x.shape[-1] // 2
    return jnp.concatenate(
        [jnp.pad(x[..., :c], ((0, 0), (0, 0), (0, 1), (0, 0))),
         jnp.pad(x[..., c:], ((0, 0), (0, 0), (1, 0), (0, 0)))], axis=-1)


def conv_packed1x2_insplit_concat(x: jnp.ndarray, w_ic: jnp.ndarray,
                                  bias: jnp.ndarray | None = None
                                  ) -> jnp.ndarray:
    """Exact width-packed stride-1 conv: column-shifted concat + one
    (3,2) conv, SAME rows / VALID cols."""
    z = insplit_concat_input_1x2(x)
    y = jax.lax.conv_general_dilated(
        z, w_ic.astype(x.dtype), (1, 1), [(1, 1), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)
    if bias is not None:
        y = y + jnp.tile(bias, 2).astype(y.dtype)
    return y


def _use_sparse_kernel(c4in: int, c4out: int) -> bool:
    """Dispatch the block-sparse Pallas kernel (ops/pallas/conv_packed.py)
    for lane-aligned packed channel counts. OPT-IN via VLG_PACKED_SPARSE=1:
    the kernel wins 1.26x in isolation (2.67x logical FLOPs vs dense 4x,
    exact numerics — tools/validate_sparse_convs_tpu.py) but LOSES end to
    end (765 vs 825 fps rollout): each pallas_call boundary cuts XLA's
    elementwise-into-conv fusion across the surrounding graph, which is
    worth more than the kernel's FLOP savings. Kept for experiments and as
    the substrate for future whole-block mega-kernels."""
    import os

    import jax as _jax
    if os.environ.get("VLG_PACKED_SPARSE", "0") != "1":
        return False
    if _jax.default_backend() not in ("tpu", "axon"):
        return False
    return c4in % 128 == 0 and c4out % 128 == 0


def conv_packed3x3_dense(x: jnp.ndarray, w_packed: jnp.ndarray,
                         bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """The dense XLA packed-space conv (always; no kernel dispatch)."""
    y = jax.lax.conv_general_dilated(
        x, w_packed, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)
    if bias is not None:
        y = y + jnp.tile(bias, 4).astype(y.dtype)
    return y


def conv_packed3x3(x: jnp.ndarray, w_packed: jnp.ndarray,
                   bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """Packed-space stride-1 conv; bias is the logical (Co,) bias."""
    if _use_sparse_kernel(x.shape[-1], w_packed.shape[-1]):
        from .pallas.conv_packed import conv_packed3x3_sparse
        return conv_packed3x3_sparse(x, w_packed, bias)
    return conv_packed3x3_dense(x, w_packed, bias)


def conv_packed_stride2(x: jnp.ndarray, w_packed2: jnp.ndarray,
                        bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """Packed input -> unpacked half-res output (the logical stride-2 conv)."""
    y = jax.lax.conv_general_dilated(
        x, w_packed2, (1, 1), [(1, 0), (1, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


@functools.lru_cache(maxsize=None)
def _phase_matrices(in_size: int):
    """Align-corners x2 interpolation matrix split into even/odd phases."""
    from .resize import _interp_matrix_np
    a = _interp_matrix_np(in_size, 2 * in_size, "bilinear", True)
    return np.ascontiguousarray(a[0::2]), np.ascontiguousarray(a[1::2])


def packed_upsample2x_align(x: jnp.ndarray) -> jnp.ndarray:
    """Align-corners bilinear x2 of (B,H,W,C), emitted directly in packed
    layout (B,H,W,4C) — equivalent to pack2x2(upsample2x(x)).

    Banded stencil form: the x2 matrix is 3-banded around r//2, so each
    phase is a shifted elementwise blend (ops/resize.upsample2x_phases) —
    measured 4.9 ms -> sub-ms vs the dense einsum at the b=128 rollout
    shape."""
    from .resize import upsample2x_phases
    return jnp.concatenate(upsample2x_phases(x, True), axis=-1)


def packed_upsample2x_align_einsum(x: jnp.ndarray) -> jnp.ndarray:
    """Dense-matmul reference implementation (kept for parity tests)."""
    b, h, w, c = x.shape
    ah0, ah1 = (jnp.asarray(m, x.dtype) for m in _phase_matrices(h))
    aw0, aw1 = (jnp.asarray(m, x.dtype) for m in _phase_matrices(w))
    rows = [jnp.einsum("ph,bhwc->bpwc", m, x,
                       preferred_element_type=x.dtype) for m in (ah0, ah1)]
    phases = []
    for ry in rows:                    # dy = 0, 1
        for mw in (aw0, aw1):          # dx = 0, 1
            phases.append(jnp.einsum("qw,bpwc->bpqc", mw, ry,
                                     preferred_element_type=x.dtype))
    return jnp.concatenate(phases, axis=-1)


# ---- 1x2 (width-only) space-to-depth -------------------------------------
#
# dx-major channel order (packed ch = dx*C + c) makes the pack/unpack a pure
# reshape in NHWC — adjacent pixel pairs are already channel-contiguous in
# memory — so wrapping a conv in pack1x2/unpack1x2 is free. Used to run
# C=64 rows (GridNet row 1, reference src/models/gridnet.py:9-16; HNED/VGG
# stage-1) as lane-filling C=128 convs. Same tap identity as 2x2 on the x
# axis only: kx = 2q+1+d-e.


def pack1x2(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, 2W, C) -> (B, H, W, 2C), dx-major channels. Pure reshape."""
    b, h, w2, c = x.shape
    return x.reshape(b, h, w2 // 2, 2 * c)


def unpack1x2(y: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 2C) -> (B, H, 2W, C). Pure reshape."""
    b, h, w, c2 = y.shape
    return y.reshape(b, h, 2 * w, c2 // 2)


def pack_kernel3x3_1x2(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,Ci,Co) logical kernel -> (3,3,2Ci,2Co) width-packed kernel.

    y axis untouched; x axis follows the stride-1 tap identity, so the
    qx=-1 plane is nonzero only in its d=1 input rows and qx=+1 only in
    d=0 (the block sparsity ops/pallas/conv1x2.py exploits).
    """
    _, _, ci, co = w.shape
    taps = _axis_taps_s1()
    out = jnp.zeros((3, 3, 2 * ci, 2 * co), w.dtype)
    for ky in range(3):
        for ex in (0, 1):
            for dx in (0, 1):
                for qx, kx in taps[(ex, dx)]:
                    out = out.at[ky, qx + 1, dx * ci:(dx + 1) * ci,
                                 ex * co:(ex + 1) * co].set(w[ky, kx])
    return out


def conv_packed1x2_dense(x: jnp.ndarray, w_packed: jnp.ndarray,
                         bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """Width-packed stride-1 conv (dense XLA); bias is logical (Co,)."""
    y = jax.lax.conv_general_dilated(
        x, w_packed, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)
    if bias is not None:
        y = y + jnp.tile(bias, 2).astype(y.dtype)
    return y


def use_w2_dense(width: int, cin: int, cout: int) -> bool:
    """Dispatch gate for the DENSE 1x2 width-packed conv (pure XLA, free
    reshape packing). OPT-IN via VLG_W2_DENSE=1: the conv wins 1.43x in
    isolation at the C64 @256px training shape (39 -> 56 TF/s) but the
    full training step measured SLOWER with it (142.5 vs 135.5 ms/step,
    even with a standard-conv custom VJP) — in-context XLA fusion around
    the standard conv outweighs the isolated gain, the same finding as the
    Pallas sparse kernels (BENCH_NOTES.md)."""
    import os

    import jax as _jax
    if os.environ.get("VLG_W2_DENSE", "0") != "1":
        return False
    if _jax.default_backend() not in ("tpu", "axon"):
        return False
    return width % 2 == 0 and width >= 256 and cout == 64 and cin <= 64


@jax.custom_vjp
def conv3x3_w2(x: jnp.ndarray, k: jnp.ndarray,
               b: jnp.ndarray) -> jnp.ndarray:
    """Standard-layout 3x3 SAME conv whose FORWARD runs 1x2 width-packed
    (1.43x at C64 @256px) while the BACKWARD is the standard conv's VJP —
    the packed conv's transposed-conv VJP measured slower than standard,
    cancelling the forward win in the training step."""
    return unpack1x2(conv_packed1x2_dense(pack1x2(x),
                                          pack_kernel3x3_1x2(k), b))


def conv3x3_same(x, k, b=None):
    """Plain stride-1 SAME 3x3 conv + optional bias (NHWC) — the shared
    reference implementation for packed/Pallas backward paths."""
    y = jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)
    return y if b is None else y + b.astype(y.dtype)


_conv3x3_std = conv3x3_same


def _w2_fwd(x, k, b):
    return conv3x3_w2(x, k, b), (x, k, b)


def _w2_bwd(res, g):
    x, k, b = res
    _, vjp = jax.vjp(_conv3x3_std, x, k, b)
    return vjp(g)


conv3x3_w2.defvjp(_w2_fwd, _w2_bwd)


def pack_kernel3x3_1x2_insplit(w: jnp.ndarray):
    """Input-phase split of the width-packed stride-1 conv: two
    (3,2,Ci,2Co) kernels (one per input column phase dx, each carrying its
    9 redistributed logical taps), summed — 12·Ci·Co MACs per output pixel
    vs the dense (3,3,2Ci,2Co) form's 18 (1.33x vs 2x inflation) at the
    same 2Co output lanes. See pack_kernel3x3_insplit for the derivation.

    Returns [(kernel, ((1,1),(px_lo,px_hi))), ...] in dx order; apply with
    ``conv_packed1x2_insplit``.
    """
    _, _, ci, co = w.shape
    # traceable jnp placement (no numpy) — see pack_kernel3x3_insplit
    zero = jnp.zeros((ci, co), w.dtype)
    out = []
    for dx in (0, 1):
        qxs = (0, 1) if dx == 0 else (-1, 0)

        def tap(ky, qx, ex, dx=dx):
            kx = 2 * qx + 1 + dx - ex
            if 0 <= kx <= 2:
                return w[ky, kx]
            return zero

        k = jnp.stack([
            jnp.stack([
                jnp.concatenate([tap(ky, qx, ex) for ex in (0, 1)], axis=-1)
                for qx in qxs], axis=0)
            for ky in range(3)], axis=0)
        pad = ((1, 1), (0, 1) if dx == 0 else (1, 0))
        out.append((k, pad))
    return out


def conv_packed1x2_insplit(x: jnp.ndarray, kernels,
                           bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """Sum of two input-phase convs (pack_kernel3x3_1x2_insplit); exact
    width-packed stride-1 conv at 1.33x logical FLOPs (vs dense 2x)."""
    c = x.shape[-1] // 2
    y = None
    for d, (k, pad) in enumerate(kernels):
        yi = jax.lax.conv_general_dilated(
            x[..., d * c:(d + 1) * c], k.astype(x.dtype), (1, 1), list(pad),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype)
        y = yi if y is None else y + yi
    if bias is not None:
        y = y + jnp.tile(bias, 2).astype(y.dtype)
    return y


def pack_kernel3x3_1x2_stride2(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,Ci,Co) stride-2 logical kernel -> (3,2,2Ci,Co) for a width-
    packed input: y axis standard (stride 2), x axis follows the packed
    stride-2 identity kx = 2q+d+1. Apply with strides (2,1) and padding
    ((1,1),(1,0)); the output is at the downsampled standard resolution.
    """
    _, _, ci, co = w.shape
    taps = _axis_taps_s2()
    out = jnp.zeros((3, 2, 2 * ci, co), w.dtype)
    for ky in range(3):
        for dx in (0, 1):
            for qx, kx in taps[dx]:
                out = out.at[ky, qx + 1, dx * ci:(dx + 1) * ci, :].set(
                    w[ky, kx])
    return out


def conv_packed1x2_stride2(x: jnp.ndarray, w_packed: jnp.ndarray,
                           bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """Width-packed input -> standard half-res output (logical stride-2)."""
    y = jax.lax.conv_general_dilated(
        x, w_packed, (2, 1), [(1, 1), (1, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y

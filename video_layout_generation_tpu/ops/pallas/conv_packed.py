"""Pallas TPU kernel: block-sparse conv for 2x2 space-to-depth packed space.

The packed executor (models/fast_gridnet.py) runs GridNet's 256px/C=32 row
(reference src/models/modules.py:5-25) as 128px/C=128 convs via 2x2
space-to-depth (ops/packed.py). That transform is exact but its packed
(3,3,4C,4C) kernel is 75% structural zeros — per axis, an (output-phase e,
input-phase d) pair admits a tap at shift q only when k = 2q+1+d-e lands in
[0,2] — so the dense packed conv spends 4x the logical FLOPs (measured
121 TF/s dense on v5e = ~30 TF/s of *useful* work).

This kernel exploits the block structure. Group taps by the row shift qy:

  qy =  0: all four input phase blocks of row y       (4C lanes, dense)
  qy = -1: only the dy=1 phase blocks of row y-1      (high 2C lanes)
  qy = +1: only the dy=0 phase blocks of row y+1      (low 2C lanes)

so rows y-1 and y+1 contribute *complementary lane halves* — a lane-slice
concat merges them into one full-width operand (one aligned half-tile copy
each). The x-axis shifts are folded through the output dimension: each
of the two operands hits a (4C, 3·4Co) weight matrix (the three qx tap
planes stacked along columns), and the three column blocks are re-aligned
with two shifted adds. Net cost: two K=4C MXU dots per tile = 2.67x logical
FLOPs (vs 4x dense) with MXU-friendly shapes (K=128, N=384 for row 0).

Forward-only optimization target (rollout/serving + the training forward);
backward defers to ``jax.vjp`` of the dense XLA packed conv — identical
math, so training gradients are unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..packed import conv_packed3x3_dense as _xla_conv_packed3x3


def wmats_from_packed(wp: jnp.ndarray):
    """(3,3,4Ci,4Co) packed kernel (pack_kernel3x3) -> (Wa, Wb).

    Wa (4Ci, 3*4Co): qy=0 tap plane per qx column block.
    Wb (4Ci, 3*4Co): rows [0:2Ci] = qy=+1 plane's dy=0 rows, rows [2Ci:] =
    qy=-1 plane's dy=1 rows — matching the select-merged operand layout.
    The dropped rows (dy=1 of qy=+1, dy=0 of qy=-1) are structural zeros.
    """
    c4 = wp.shape[2]
    c2 = c4 // 2
    wa = jnp.concatenate([wp[1, qx] for qx in range(3)], axis=1)
    wb = jnp.concatenate(
        [jnp.concatenate([wp[2, qx, :c2], wp[0, qx, c2:]], axis=0)
         for qx in range(3)], axis=1)
    return wa, wb


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv_packed3x3_sparse(xp, wp, bias, tile_h: int = 32):
    """Packed-space stride-1 3x3 conv (+ logical bias), sparse-aware.

    Drop-in for ops.packed.conv_packed3x3 when ``supported()`` holds:
    xp (N,H,W,4Ci) phase-major, wp (3,3,4Ci,4Co) from pack_kernel3x3,
    bias logical (Co,) or None. (The no-activation, no-residual case of
    the fused kernel below.)
    """
    return _fused_impl(xp, wp, bias, None, None, tile_h)


def _fwd(xp, wp, bias, tile_h):
    return _fused_impl(xp, wp, bias, None, None, tile_h), (xp, wp, bias)


def _bwd(tile_h, res, g):
    xp, wp, bias = res
    if bias is None:
        _, vjp = jax.vjp(lambda x, w: _xla_conv_packed3x3(x, w, None),
                         xp, wp)
        return vjp(g) + (None,)
    _, vjp = jax.vjp(_xla_conv_packed3x3, xp, wp, bias)
    return vjp(g)


conv_packed3x3_sparse.defvjp(_fwd, _bwd)


def supported(c4in: int, c4out: int) -> bool:
    """Lane-aligned packed channel counts the kernel handles."""
    return c4in % 128 == 0 and c4out % 128 == 0


# ---- fused PReLU -> conv (-> + residual) ---------------------------------
#
# End-to-end the bare sparse conv LOSES to XLA's dense packed conv (0.94x
# measured on the full rollout) even though it wins 1.26x in isolation: XLA
# fuses the executor's PReLU / grid-add elementwise ops into its conv
# loops, while a pallas_call boundary forces them into separate HBM-bound
# passes (~1.3 ms per elementwise pass at the batch-128 rollout shape, vs
# ~4 ms per conv). These variants pull the preceding PReLU (scalar alpha,
# reference nn.PReLU default) and the additive grid fusion into the kernel
# so the packed executor crosses HBM exactly once per conv.


def _make_fused_kernel(act: bool, res: bool):
    def kernel(*refs):
        x_top_ref, x_mid_ref, x_bot_ref, wa_ref, wb_ref, b_ref = refs[:6]
        i = 6
        a_ref = None
        r_ref = None
        if act:
            a_ref = refs[i]
            i += 1
        if res:
            r_ref = refs[i]
            i += 1
        out_ref = refs[-1]

        th = x_mid_ref.shape[1]
        w = x_mid_ref.shape[2]
        c4 = x_mid_ref.shape[3]
        c2 = c4 // 2
        co4 = out_ref.shape[3]
        j = pl.program_id(1)
        nj = pl.num_programs(1)

        top = x_top_ref[0]
        bot = x_bot_ref[0]
        top = jnp.where(j == 0, jnp.zeros_like(top), top)
        bot = jnp.where(j == nj - 1, jnp.zeros_like(bot), bot)
        mid = x_mid_ref[0]
        if act:
            # compare in f32: Mosaic rejects bf16 cmpf on this target; the
            # multiply stays in the input dtype (bit-matches the XLA path)
            a = a_ref[0, 0].astype(mid.dtype)

            def _prelu_t(z):
                return jnp.where(z.astype(jnp.float32) >= 0, z, a * z)

            mid = _prelu_t(mid)
            top = _prelu_t(top)
            bot = _prelu_t(bot)

        up = jnp.concatenate([top, mid[:-1]], axis=0)
        dn = jnp.concatenate([mid[1:], bot], axis=0)
        updn = jnp.concatenate([dn[:, :, :c2], up[:, :, c2:]], axis=-1)

        y = jnp.dot(mid.reshape(th * w, c4), wa_ref[...],
                    preferred_element_type=jnp.float32)
        y = y + jnp.dot(updn.reshape(th * w, c4), wb_ref[...],
                        preferred_element_type=jnp.float32)
        y = y.reshape(th, w, 3 * co4)

        zc = jnp.zeros((th, 1, co4), jnp.float32)
        out = (y[:, :, co4:2 * co4]
               + jnp.concatenate([zc, y[:, :-1, :co4]], axis=1)
               + jnp.concatenate([y[:, 1:, 2 * co4:], zc], axis=1))
        out = out + b_ref[...].astype(jnp.float32)
        if res:
            out = out + r_ref[0].astype(jnp.float32)
        out_ref[0] = out.astype(out_ref.dtype)

    return kernel


def _fused_impl(xp, wp, bias, alpha, residual, tile_h: int):
    from jax.experimental.pallas import tpu as pltpu

    n, h, w, c4 = xp.shape
    co4 = wp.shape[-1]
    th = min(tile_h, h)
    while h % th:
        th //= 2
    nj = h // th

    wa, wb = wmats_from_packed(wp.astype(xp.dtype))
    b4 = (jnp.zeros((1, co4), jnp.float32) if bias is None
          else jnp.tile(bias.astype(jnp.float32), 4).reshape(1, co4))

    in_specs = [
        pl.BlockSpec((1, 1, w, c4),
                     lambda i, j: (i, jnp.maximum(j * th - 1, 0), 0, 0)),
        pl.BlockSpec((1, th, w, c4), lambda i, j: (i, j, 0, 0)),
        pl.BlockSpec((1, 1, w, c4),
                     lambda i, j: (i, jnp.minimum(j * th + th, h - 1),
                                   0, 0)),
        pl.BlockSpec((c4, 3 * co4), lambda i, j: (0, 0)),
        pl.BlockSpec((c4, 3 * co4), lambda i, j: (0, 0)),
        pl.BlockSpec((1, co4), lambda i, j: (0, 0)),
    ]
    args = [xp, xp, xp, wa, wb, b4]
    if alpha is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(jnp.asarray(alpha, jnp.float32).reshape(1, 1))
    if residual is not None:
        in_specs.append(pl.BlockSpec((1, th, w, co4),
                                     lambda i, j: (i, j, 0, 0)))
        args.append(residual)

    return pl.pallas_call(
        _make_fused_kernel(alpha is not None, residual is not None),
        grid=(n, nj),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, th, w, co4), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, w, co4), xp.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w * c4 * 3 * co4 * 2,
            bytes_accessed=(n * h * w * (c4 + co4) * xp.dtype.itemsize
                            + 2 * c4 * 3 * co4 * xp.dtype.itemsize),
            transcendentals=0),
    )(*args)


def _prelu_ref(xp, alpha):
    a = alpha.astype(xp.dtype)
    return jnp.where(xp >= 0, xp, a * xp)


# ---- fully fused LateralBlock ---------------------------------------------
#
# One pallas_call for the whole packed lateral (reference LateralBlock,
# src/models/modules.py:5-25 executing in 2x2 packed space):
#
#   out = conv1(prelu1(conv0(prelu0(x)))) [+ residual]
#
# Both sparse packed convs, both PReLUs, the biases, and the grid-fusion
# residual execute in a single VMEM-resident tile pass: the intermediate
# activation never touches HBM, and there is NO elementwise epilogue left
# for XLA to lose at a kernel boundary (the failure mode that sank the
# per-conv sparse kernels end-to-end — see the note above).
# Channel-preserving laterals only (c4in == c4out, no Conv_2 shortcut) —
# exactly GridNet's in-grid row-0 laterals. Forward-only; backward defers
# to jax.vjp of the XLA formulation (identical math).


def _fused_lateral_kernel(res: bool):
    def kernel(*refs):
        (x_t2, x_t1, x_mid, x_b1, x_b2,
         wa0_ref, wb0_ref, wa1_ref, wb1_ref, b0_ref, b1_ref,
         a_ref) = refs[:12]
        r_ref = refs[12] if res else None
        out_ref = refs[-1]

        th = x_mid.shape[1]
        w = x_mid.shape[2]
        c4 = x_mid.shape[3]
        c2 = c4 // 2
        co4 = out_ref.shape[3]
        co2 = co4 // 2
        j = pl.program_id(1)
        nj = pl.num_programs(1)

        a0 = a_ref[0, 0]
        a1 = a_ref[0, 1]

        def _prelu(z, a):
            return jnp.where(z.astype(jnp.float32) >= 0,
                             z, a.astype(z.dtype) * z)

        zrow = jnp.zeros_like(x_mid[0][:1])
        t2 = jnp.where(j == 0, zrow, x_t2[0])
        t1 = jnp.where(j == 0, zrow, x_t1[0])
        b1r = jnp.where(j == nj - 1, zrow, x_b1[0])
        b2r = jnp.where(j == nj - 1, zrow, x_b2[0])
        # (th + 4) rows of PReLU'd input: tile rows plus a 2-row halo on
        # each side (conv0 feeds conv1's 1-row halo)
        x_ext = _prelu(jnp.concatenate([t2, t1, x_mid[0], b1r, b2r],
                                       axis=0), a0)

        def conv_stage(xact, wa_r, wb_r, n_out, cin4, cout4):
            ci2 = cin4 // 2
            mid = xact[1:n_out + 1]
            up = xact[0:n_out]
            dn = xact[2:n_out + 2]
            updn = jnp.concatenate([dn[:, :, :ci2], up[:, :, ci2:]],
                                   axis=-1)
            y = jnp.dot(mid.reshape(n_out * w, cin4), wa_r[...],
                        preferred_element_type=jnp.float32)
            y = y + jnp.dot(updn.reshape(n_out * w, cin4), wb_r[...],
                            preferred_element_type=jnp.float32)
            y = y.reshape(n_out, w, 3 * cout4)
            zc = jnp.zeros((n_out, 1, cout4), jnp.float32)
            return (y[:, :, cout4:2 * cout4]
                    + jnp.concatenate([zc, y[:, :-1, :cout4]], axis=1)
                    + jnp.concatenate([y[:, 1:, 2 * cout4:], zc], axis=1))

        # conv0 over (th + 2) output rows [tile start - 1, tile end + 1)
        y0 = conv_stage(x_ext, wa0_ref, wb0_ref, th + 2, c4, co4)
        y0 = y0 + b0_ref[...].astype(jnp.float32)
        # rows outside the image are SAME-padding zeros for conv1, not
        # conv0(0)=bias
        zy = jnp.zeros_like(y0[:1])
        y0 = jnp.concatenate([jnp.where(j == 0, zy, y0[:1]), y0[1:]],
                             axis=0)
        y0 = jnp.concatenate([y0[:-1],
                              jnp.where(j == nj - 1, zy, y0[-1:])], axis=0)
        # bf16 round-trip matches the XLA path's conv -> prelu dtype chain
        y0 = _prelu(y0.astype(x_mid.dtype), a1)

        z = conv_stage(y0, wa1_ref, wb1_ref, th, co4, co4)
        z = z + b1_ref[...].astype(jnp.float32)
        if res:
            z = z + r_ref[0].astype(jnp.float32)
        out_ref[0] = z.astype(out_ref.dtype)
        del co2
    return kernel


def _fused_lateral_impl(xp, wp0, bias0, alpha0, wp1, bias1, alpha1,
                        residual, tile_h: int):
    from jax.experimental.pallas import tpu as pltpu

    n, h, w, c4 = xp.shape
    co4 = wp1.shape[-1]
    th = min(tile_h, h)
    while h % th:
        th //= 2
    nj = h // th

    wa0, wb0 = wmats_from_packed(wp0.astype(xp.dtype))
    wa1, wb1 = wmats_from_packed(wp1.astype(xp.dtype))
    b0 = jnp.tile(bias0.astype(jnp.float32), 4).reshape(1, co4)
    b1 = jnp.tile(bias1.astype(jnp.float32), 4).reshape(1, co4)
    alphas = jnp.stack([jnp.asarray(alpha0, jnp.float32).reshape(()),
                        jnp.asarray(alpha1, jnp.float32).reshape(())]
                       ).reshape(1, 2)

    in_specs = [
        pl.BlockSpec((1, 1, w, c4),
                     lambda i, j: (i, jnp.maximum(j * th - 2, 0), 0, 0)),
        pl.BlockSpec((1, 1, w, c4),
                     lambda i, j: (i, jnp.maximum(j * th - 1, 0), 0, 0)),
        pl.BlockSpec((1, th, w, c4), lambda i, j: (i, j, 0, 0)),
        pl.BlockSpec((1, 1, w, c4),
                     lambda i, j: (i, jnp.minimum(j * th + th, h - 1),
                                   0, 0)),
        pl.BlockSpec((1, 1, w, c4),
                     lambda i, j: (i, jnp.minimum(j * th + th + 1, h - 1),
                                   0, 0)),
        pl.BlockSpec((c4, 3 * co4), lambda i, j: (0, 0)),
        pl.BlockSpec((c4, 3 * co4), lambda i, j: (0, 0)),
        pl.BlockSpec((co4, 3 * co4), lambda i, j: (0, 0)),
        pl.BlockSpec((co4, 3 * co4), lambda i, j: (0, 0)),
        pl.BlockSpec((1, co4), lambda i, j: (0, 0)),
        pl.BlockSpec((1, co4), lambda i, j: (0, 0)),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    args = [xp, xp, xp, xp, xp, wa0, wb0, wa1, wb1, b0, b1, alphas]
    if residual is not None:
        in_specs.append(pl.BlockSpec((1, th, w, co4),
                                     lambda i, j: (i, j, 0, 0)))
        args.append(residual)

    flops_conv = 2 * n * h * w * c4 * 3 * co4 * 2
    return pl.pallas_call(
        _fused_lateral_kernel(residual is not None),
        grid=(n, nj),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, th, w, co4), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, w, co4), xp.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * flops_conv,
            bytes_accessed=(n * h * w * (c4 + co4) * xp.dtype.itemsize
                            + 4 * c4 * 3 * co4 * xp.dtype.itemsize),
            transcendentals=0),
    )(*args)


def _lateral_ref_xla(xp, wp0, bias0, alpha0, wp1, bias1, alpha1, residual):
    y = _prelu_ref(xp, alpha0)
    y = _xla_conv_packed3x3(y, wp0.astype(xp.dtype), bias0)
    y = _prelu_ref(y, alpha1)
    y = _xla_conv_packed3x3(y, wp1.astype(xp.dtype), bias1)
    if residual is not None:
        y = y + residual
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def fused_lateral_packed3x3(xp, wp0, bias0, alpha0, wp1, bias1, alpha1,
                            residual=None, tile_h: int = 16):
    """Whole LateralBlock in one kernel: conv1(prelu1(conv0(prelu0(x))))
    [+ residual]. Channel-preserving packed laterals only (no Conv_2).
    wp0/wp1 from pack_kernel3x3, biases logical (Co,), alphas the
    reference's scalar PReLU parameters."""
    return _fused_lateral_impl(xp, wp0, bias0, alpha0, wp1, bias1, alpha1,
                               residual, tile_h)


def _fl_fwd(xp, wp0, bias0, alpha0, wp1, bias1, alpha1, residual, tile_h):
    out = _fused_lateral_impl(xp, wp0, bias0, alpha0, wp1, bias1, alpha1,
                              residual, tile_h)
    return out, (xp, wp0, bias0, alpha0, wp1, bias1, alpha1, residual)


def _fl_bwd(tile_h, resids, g):
    xp, wp0, bias0, alpha0, wp1, bias1, alpha1, residual = resids
    if residual is None:
        _, vjp = jax.vjp(
            lambda x, w0, b0, a0, w1, b1, a1:
            _lateral_ref_xla(x, w0, b0, a0, w1, b1, a1, None),
            xp, wp0, bias0, alpha0, wp1, bias1, alpha1)
        return vjp(g) + (None,)
    _, vjp = jax.vjp(_lateral_ref_xla, xp, wp0, bias0, alpha0, wp1, bias1,
                     alpha1, residual)
    return vjp(g)


fused_lateral_packed3x3.defvjp(_fl_fwd, _fl_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def prelu_conv_packed3x3(xp, wp, bias, alpha, tile_h: int = 32):
    """Fused conv(prelu(x, alpha)) in packed space; bias logical (Co,),
    alpha the reference's scalar PReLU parameter."""
    return _fused_impl(xp, wp, bias, alpha, None, tile_h)


def _pc_fwd(xp, wp, bias, alpha, tile_h):
    return _fused_impl(xp, wp, bias, alpha, None, tile_h), (xp, wp, bias,
                                                            alpha)


def _pc_bwd(tile_h, resids, g):
    xp, wp, bias, alpha = resids
    _, vjp = jax.vjp(
        lambda x, w, b, a: _xla_conv_packed3x3(_prelu_ref(x, a), w, b),
        xp, wp, bias, alpha)
    return vjp(g)


prelu_conv_packed3x3.defvjp(_pc_fwd, _pc_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def prelu_conv_packed3x3_res(xp, wp, bias, alpha, residual,
                             tile_h: int = 32):
    """Fused conv(prelu(x, alpha)) + residual — the packed grid-fusion add
    (reference src/models/gridnet.py:43-58) folded into the kernel's f32
    epilogue."""
    return _fused_impl(xp, wp, bias, alpha, residual, tile_h)


def _pcr_fwd(xp, wp, bias, alpha, residual, tile_h):
    return (_fused_impl(xp, wp, bias, alpha, residual, tile_h),
            (xp, wp, bias, alpha, residual))


def _pcr_bwd(tile_h, resids, g):
    xp, wp, bias, alpha, residual = resids
    _, vjp = jax.vjp(
        lambda x, w, b, a, r:
        _xla_conv_packed3x3(_prelu_ref(x, a), w, b) + r.astype(x.dtype),
        xp, wp, bias, alpha, residual)
    return vjp(g)


prelu_conv_packed3x3_res.defvjp(_pcr_fwd, _pcr_bwd)

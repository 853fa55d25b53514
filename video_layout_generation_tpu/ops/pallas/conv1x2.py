"""Pallas TPU kernel: block-sparse conv in 1x2 width-packed space.

C=64 3x3 convs (GridNet row 1, reference src/models/gridnet.py:9-16;
HNED/VGG stage 1, src/models/hned.py:14-18, src/loss.py:33-35) fill only
half the MXU's 128 lanes (~55 TF/s measured on v5e vs ~121-152 at C=128).
1x2 width packing (ops/packed.py pack1x2 — a FREE reshape in NHWC thanks to
dx-major channel order) doubles the lane count, and this kernel exploits
the packed kernel's x-axis block sparsity the same way conv_packed.py does
on the y axis of 2x2 packing, with the roles mirrored:

  qx =  0: both dx phase blocks of column x          (2C lanes, dense)
  qx = +1: only the dx=0 block of column x+1         (low C lanes)
  qx = -1: only the dx=1 block of column x-1         (high C lanes)

so the two shifted columns merge into one operand with a single lane
select. The y taps fold through the output dimension: two K=2C dots against
(2C, 3*2Co) weight planes, evaluated on the tile's th+2 rows (one halo row
each side), then three static row slices re-align the ky column blocks.
Cost: ~1.33*(1+2/th) x logical FLOPs — vs 2x for the dense packed conv and
half-empty lanes for the unpacked conv.

Forward-optimized; backward defers to ``jax.vjp`` of the standard XLA conv
(identical math).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..packed import conv3x3_same as _xla_conv3x3
from ..packed import pack1x2, pack_kernel3x3_1x2, unpack1x2


def wmats_from_packed1x2(wp: jnp.ndarray):
    """(3,3,2Ci,2Co) width-packed kernel -> (Wa, Wb), each (2Ci, 3*2Co).

    Wa: the qx=0 tap plane, ky planes stacked along columns.
    Wb: rows [0:Ci] = qx=+1 plane's dx=0 rows, rows [Ci:] = qx=-1 plane's
    dx=1 rows (matching the select-merged shifted-column operand). The
    dropped rows are structural zeros of pack_kernel3x3_1x2.
    """
    ci = wp.shape[2] // 2
    wa = jnp.concatenate([wp[ky, 1] for ky in range(3)], axis=1)
    wb = jnp.concatenate(
        [jnp.concatenate([wp[ky, 2, :ci], wp[ky, 0, ci:]], axis=0)
         for ky in range(3)], axis=1)
    return wa, wb


def _kernel(x_top_ref, x_mid_ref, x_bot_ref, wa_ref, wb_ref, b_ref, out_ref):
    th = x_mid_ref.shape[1]
    w = x_mid_ref.shape[2]
    c2 = x_mid_ref.shape[3]
    c = c2 // 2
    co2 = out_ref.shape[3]
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    top = x_top_ref[0]
    bot = x_bot_ref[0]
    top = jnp.where(j == 0, jnp.zeros_like(top), top)
    bot = jnp.where(j == nj - 1, jnp.zeros_like(bot), bot)
    full = jnp.concatenate([top, x_mid_ref[0], bot], axis=0)  # (th+2, W, 2C)

    # shifted-column operand: dx=0 block (low C lanes) from column x+1,
    # dx=1 block (high C lanes) from column x-1; zero at the width edges
    # (packed-space SAME padding)
    zc = jnp.zeros((th + 2, 1, c2), full.dtype)
    right = jnp.concatenate([full[:, 1:], zc], axis=1)
    left = jnp.concatenate([zc, full[:, :-1]], axis=1)
    # lane-slice concat, not iota+where select: the select's Mosaic compile
    # takes minutes (tools/bisect_mosaic_compile.py)
    shifted = jnp.concatenate([right[:, :, :c], left[:, :, c:]], axis=-1)

    y = jnp.dot(full.reshape((th + 2) * w, c2), wa_ref[...],
                preferred_element_type=jnp.float32)
    y = y + jnp.dot(shifted.reshape((th + 2) * w, c2), wb_ref[...],
                    preferred_element_type=jnp.float32)
    y = y.reshape(th + 2, w, 3 * co2)

    # fold ky column blocks back onto the y axis: out row y draws ky=0 from
    # Y row y-1 (= tile row y), ky=1 from y, ky=2 from y+1
    out = (y[0:th, :, :co2] + y[1:th + 1, :, co2:2 * co2]
           + y[2:th + 2, :, 2 * co2:])
    out = out + b_ref[...].astype(jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


def _fwd_impl(xp, wp, bias, tile_h: int):
    n, h, w, c2 = xp.shape
    co2 = wp.shape[-1]
    th = min(tile_h, h)
    while h % th:
        th //= 2
    nj = h // th

    wa, wb = wmats_from_packed1x2(wp.astype(xp.dtype))
    if bias is None:
        b2 = jnp.zeros((1, co2), jnp.float32)
    else:
        b2 = jnp.tile(bias.astype(jnp.float32), 2).reshape(1, co2)

    return pl.pallas_call(
        _kernel,
        grid=(n, nj),
        in_specs=[
            pl.BlockSpec((1, 1, w, c2),
                         lambda i, j: (i, jnp.maximum(j * th - 1, 0), 0, 0)),
            pl.BlockSpec((1, th, w, c2), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, w, c2),
                         lambda i, j: (i, jnp.minimum(j * th + th, h - 1),
                                       0, 0)),
            pl.BlockSpec((c2, 3 * co2), lambda i, j: (0, 0)),
            pl.BlockSpec((c2, 3 * co2), lambda i, j: (0, 0)),
            pl.BlockSpec((1, co2), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, w, co2), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, w, co2), xp.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * (h + 2 * nj) * w * c2 * 3 * co2 * 2,
            bytes_accessed=(n * h * w * (c2 + co2) * xp.dtype.itemsize
                            + 2 * c2 * 3 * co2 * xp.dtype.itemsize),
            transcendentals=0),
    )(xp, xp, xp, wa, wb, b2)



@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3x3_w1x2(x, w, bias, tile_h: int = 32):
    """Standard-layout stride-1 SAME 3x3 conv (+ bias), executed in 1x2
    width-packed space via the sparse kernel.

    x (N,H,W,Cin) with W even and 2*Cin, 2*Cout multiples of 128;
    w (3,3,Cin,Cout) logical; bias (Cout,) or None. The pack/unpack are
    free reshapes; the packed-kernel rewrite runs at trace time.
    """
    xp = pack1x2(x)
    wp = pack_kernel3x3_1x2(w)
    return unpack1x2(_fwd_impl(xp, wp, bias, tile_h))


def _fwd(x, w, bias, tile_h):
    return conv3x3_w1x2(x, w, bias, tile_h), (x, w, bias)


def _bwd(tile_h, res, g):
    x, w, bias = res
    if bias is None:
        _, vjp = jax.vjp(lambda a, k: _xla_conv3x3(a, k, None), x, w)
        return vjp(g) + (None,)
    _, vjp = jax.vjp(_xla_conv3x3, x, w, bias)
    return vjp(g)


conv3x3_w1x2.defvjp(_fwd, _bwd)


def supported(h: int, w: int, cin: int, cout: int) -> bool:
    """Shapes conv3x3_w1x2 handles: even width, lane-aligned doubled
    channels."""
    return w % 2 == 0 and (2 * cin) % 128 == 0 and (2 * cout) % 128 == 0

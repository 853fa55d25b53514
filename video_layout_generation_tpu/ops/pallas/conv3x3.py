"""Pallas TPU kernel: 3x3 stride-1 SAME conv as implicit GEMM.

Motivation (measured on v5e, tools/microbench_convs.py): XLA's conv lowering
reaches only ~122 TF/s on the packed GridNet row-0 shape (C=128 @128px,
batch 128) while the same chip sustains ~165 TF/s on a plain bf16 matmul.
This kernel reformulates the conv as 9 shifted (TH*W, C) x (C, C) MXU dots
accumulated in fp32 — the contraction is C=128 (one full lane tile), the
output tile is C=128 wide, and the halo is fetched once (two extra
single-row blocks per step) instead of XLA's re-materialized im2col.

Layout: NHWC with C (lanes) = 128*k. Grid (N, H/TH); per step the kernel
sees TH middle rows plus one halo row above and below (clamped block index
at the image edges; the duplicate edge row is zeroed in-kernel with a
``jnp.where`` on ``pl.program_id``), pads W by one zero column on each side, and runs the 9
(dy, dx) dots. Forward-only design: the rollout/serving executor is the
consumer (models/fast_gridnet.py); training keeps XLA convs, so the custom
VJP simply defers to ``jax.vjp`` of the XLA formulation (exact math).

Reference capability this accelerates: the GridNet lateral/upsample conv
stack (reference src/models/modules.py:5-58) executing in packed
space-to-depth form.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..packed import conv3x3_same as _xla_conv3x3


def _kernel(x_top_ref, x_mid_ref, x_bot_ref, w_ref, b_ref, out_ref):
    th = x_mid_ref.shape[1]
    w = x_mid_ref.shape[2]
    cin = x_mid_ref.shape[3]
    cout = out_ref.shape[3]
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    top = x_top_ref[0]                       # (1, W, C)
    bot = x_bot_ref[0]
    # clamped halo: at the image edges the "neighbor" row is a duplicate of
    # an in-image row — SAME padding means it must be zero
    top = jnp.where(j == 0, jnp.zeros_like(top), top)
    bot = jnp.where(j == nj - 1, jnp.zeros_like(bot), bot)

    win = jnp.concatenate([top, x_mid_ref[0], bot], axis=0)  # (TH+2, W, C)
    zcol = jnp.zeros((th + 2, 1, cin), win.dtype)
    win = jnp.concatenate([zcol, win, zcol], axis=1)         # (TH+2, W+2, C)

    acc = jnp.zeros((th * w, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            lhs = win[dy:dy + th, dx:dx + w, :].reshape(th * w, cin)
            acc = acc + jnp.dot(lhs, w_ref[dy, dx],
                                preferred_element_type=jnp.float32)
    acc = acc + b_ref[:].astype(jnp.float32)   # (1, Cout) broadcasts
    out_ref[0] = acc.reshape(th, w, cout).astype(out_ref.dtype)


def _conv3x3_fwd_impl(x, w, b, tile_h: int):
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    th = min(tile_h, h)
    while h % th:
        th //= 2
    nj = h // th

    grid = (n, nj)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            # one halo row above the tile (block index clamped at the top
            # edge; the kernel zeroes the duplicate row)
            pl.BlockSpec((1, 1, wd, cin),
                         lambda i, j: (i, jnp.maximum(j * th - 1, 0), 0, 0)),
            pl.BlockSpec((1, th, wd, cin), lambda i, j: (i, j, 0, 0)),
            # one halo row below
            pl.BlockSpec((1, 1, wd, cin),
                         lambda i, j: (i, jnp.minimum(j * th + th, h - 1),
                                       0, 0)),
            pl.BlockSpec((3, 3, cin, cout), lambda i, j: (0, 0, 0, 0)),
            pl.BlockSpec((1, cout), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, wd, cout), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, wd, cout), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * wd * 9 * cin * cout,
            bytes_accessed=(n * h * wd * (cin + cout) * x.dtype.itemsize
                            + 9 * cin * cout * w.dtype.itemsize),
            transcendentals=0),
    )(x, x, x, w, b.reshape(1, cout))



@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3x3_pallas(x, w, b, tile_h: int = 16):
    """3x3 stride-1 SAME conv + bias, NHWC. x: (N,H,W,Cin) with Cin, Cout
    multiples of 128 (lane-aligned); w: (3,3,Cin,Cout); b: (Cout,)."""
    return _conv3x3_fwd_impl(x, w, b, tile_h)


def _fwd(x, w, b, tile_h):
    # custom_vjp: fwd takes the primal's signature; only bwd gets the
    # nondiff args prepended
    return _conv3x3_fwd_impl(x, w, b, tile_h), (x, w, b)


def _bwd(tile_h, res, g):
    x, w, b = res
    _, vjp = jax.vjp(_xla_conv3x3, x, w, b)
    return vjp(g)


conv3x3_pallas.defvjp(_fwd, _bwd)


def lane_aligned(cin: int, cout: int) -> bool:
    return cin % 128 == 0 and cout % 128 == 0

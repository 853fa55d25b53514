"""Pallas TPU kernel: fused SSIM loss.

SURVEY.md §2d names the SSIM window ops as a Pallas fusion target: the XLA
formulation (losses/ssim.py) materializes five 3x3 window means over HBM
traffic; this kernel keeps each (sample, channel) plane resident in VMEM and
computes all window statistics, the SSIM map, the clip, and the plane mean
in ONE pass — one HBM read per input plane, one scalar write.

Layout: inputs are transposed to (N, C, H, W) so H sits in sublanes and W in
lanes (C is tiny — 3 — and would waste lanes as the minor dim). Grid is
(N, C); each program reduces its plane to out[n, c] = mean((1-SSIM)/2 clipped)
computed in fp32. The host-side wrapper sums over C and matches
losses/ssim.ssim_loss exactly (reference SsimLoss semantics,
src/loss.py:64-91).

Backward: custom VJP — residuals are the inputs; gradients come from
jax.vjp of the XLA formulation (identical math), so training through this
kernel is exact but pays a duplicated XLA forward in the backward pass.
The fused path is therefore a win for NON-differentiated uses (eval loops,
metrics); under grad, prefer the plain XLA loss (losses/ssim.py keeps
use_pallas=False by default).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_C1 = 0.01 ** 2
_C2 = 0.03 ** 2


def _pool9(a):
    """3x3 VALID mean via 9 shifted adds on a VMEM-resident (H, W) plane."""
    s = (a[:-2, :-2] + a[:-2, 1:-1] + a[:-2, 2:]
         + a[1:-1, :-2] + a[1:-1, 1:-1] + a[1:-1, 2:]
         + a[2:, :-2] + a[2:, 1:-1] + a[2:, 2:])
    return s * (1.0 / 9.0)


def _ssim_kernel(x_ref, y_ref, out_ref):
    x = x_ref[0, 0].astype(jnp.float32)     # (H, W)
    y = y_ref[0, 0].astype(jnp.float32)
    mu_x = _pool9(x)
    mu_y = _pool9(y)
    xx = _pool9(x * x) - mu_x * mu_x
    yy = _pool9(y * y) - mu_y * mu_y
    xy = _pool9(x * y) - mu_x * mu_y
    num = (2 * mu_x * mu_y + _C1) * (2 * xy + _C2)
    den = (mu_x * mu_x + mu_y * mu_y + _C1) * (xx + yy + _C2)
    val = jnp.clip((1.0 - num / den) / 2.0, 0.0, 1.0)
    # the output lives in SMEM as ONE (N, C) block shared by every grid
    # step (constant index map — Mosaic requires sub-(8,128) blocks to
    # cover the whole array); each (n, c) program writes its own element
    out_ref[pl.program_id(0), pl.program_id(1)] = jnp.mean(val)


def _ssim_pallas_fwd_impl(x, y):
    """x, y: (N, H, W, C) -> scalar (sum over C of per-channel mean)."""
    n, h, w, c = x.shape
    xt = jnp.transpose(x, (0, 3, 1, 2))
    yt = jnp.transpose(y, (0, 3, 1, 2))
    per_plane = pl.pallas_call(
        _ssim_kernel,
        grid=(n, c),
        in_specs=[
            pl.BlockSpec((1, 1, h, w), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, h, w), lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((n, c), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((n, c), jnp.float32),
    )(xt, yt)
    # mean over N per channel, then sum over channels (reference contract)
    return jnp.sum(jnp.mean(per_plane, axis=0))


def _xla_ssim(x, y):
    """The XLA formulation — single source of truth in losses/ssim.py
    (lazy import; that module lazily imports this one only at call time,
    so there is no cycle)."""
    from ...losses.ssim import ssim_loss
    return ssim_loss(x, y, use_pallas=False)


@jax.custom_vjp
def ssim_loss_pallas(x, y):
    return _ssim_pallas_fwd_impl(x, y)


def _fwd(x, y):
    return _ssim_pallas_fwd_impl(x, y), (x, y)


def _bwd(res, g):
    x, y = res
    _, vjp = jax.vjp(_xla_ssim, x, y)
    gx, gy = vjp(g)
    return gx, gy


ssim_loss_pallas.defvjp(_fwd, _bwd)


def plane_fits_vmem(shape, budget_bytes: int = 10 * 1024 * 1024) -> bool:
    _, h, w, _ = shape
    # x, y planes + ~5 fp32 temps of (H-2, W-2)
    return 7 * h * w * 4 <= budget_bytes

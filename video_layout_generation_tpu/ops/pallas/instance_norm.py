"""Pallas TPU kernel: fused single-pass InstanceNorm (NHWC).

InstanceNorm normalizes each (sample, channel) plane over H,W
(models/norms.py — the default norm of the pix2pix nets, reference
src/models/networks.py:29-30). A naive lowering reads the activation from
HBM twice (stats pass + normalize pass); this kernel tiles (N, C) over the
grid, streams each H,W plane through VMEM once, computes mean/var with a
fused reduction, and writes the normalized plane — one HBM read + one write.

Grid: (N, C // LANE). Block: the full (H, W) extent with LANE channels in
the minor dimension (lane-aligned). Stats are fp32 regardless of input
dtype. Falls back to the XLA implementation when shapes don't tile (tested
equal to models/norms.InstanceNorm).

Backward: custom VJP with the standard closed form
  dx = rstd * (dy - mean(dy) - xhat * mean(dy * xhat))
evaluated with the same kernel structure (two fused passes over dy).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

LANE = 128


def _fwd_only_kernel(x_ref, y_ref, *, eps: float):
    """Primal-only variant: no residual outputs, so non-differentiated
    forwards (eval, frozen nets) pay one HBM read + one write."""
    x = x_ref[...].astype(jnp.float32)
    hw = x.shape[1] * x.shape[2]
    mean = jnp.sum(x, axis=(1, 2), keepdims=True) / hw
    xc = x - mean
    var = jnp.sum(xc * xc, axis=(1, 2), keepdims=True) / hw
    y_ref[...] = (xc * jax.lax.rsqrt(var + eps)).astype(y_ref.dtype)


def _fwd_kernel(x_ref, y_ref, xhat_ref, rstd_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)          # (1, H, W, LANE)
    hw = x.shape[1] * x.shape[2]
    mean = jnp.sum(x, axis=(1, 2), keepdims=True) / hw
    xc = x - mean
    var = jnp.sum(xc * xc, axis=(1, 2), keepdims=True) / hw
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    y_ref[...] = xhat.astype(y_ref.dtype)
    xhat_ref[...] = xhat.astype(xhat_ref.dtype)
    rstd_ref[...] = jnp.broadcast_to(rstd, rstd_ref.shape).astype(
        rstd_ref.dtype)


def _bwd_kernel(dy_ref, xhat_ref, rstd_ref, dx_ref):
    dy = dy_ref[...].astype(jnp.float32)
    xhat = xhat_ref[...].astype(jnp.float32)
    rstd = rstd_ref[...].astype(jnp.float32)[:, :1, :1, :]
    hw = dy.shape[1] * dy.shape[2]
    m_dy = jnp.sum(dy, axis=(1, 2), keepdims=True) / hw
    m_dyx = jnp.sum(dy * xhat, axis=(1, 2), keepdims=True) / hw
    dx = rstd * (dy - m_dy - xhat * m_dyx)
    dx_ref[...] = dx.astype(dx_ref.dtype)


def _tileable(shape) -> bool:
    n, h, w, c = shape
    # one (H, W, LANE) fp32 plane (x + xhat live) must fit VMEM comfortably
    return (c % LANE == 0 and h * w * LANE * 4 * 3 <= 12 * 1024 * 1024)


def _xla_instance_norm(x, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.var(xf, axis=(1, 2), keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _pallas_fwd(x, eps):
    n, h, w, c = x.shape
    grid = (n, c // LANE)
    y, xhat, rstd = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=grid,
        in_specs=[pl.BlockSpec((1, h, w, LANE), lambda i, j: (i, 0, 0, j))],
        out_specs=[
            pl.BlockSpec((1, h, w, LANE), lambda i, j: (i, 0, 0, j)),
            pl.BlockSpec((1, h, w, LANE), lambda i, j: (i, 0, 0, j)),
            pl.BlockSpec((1, 1, 1, LANE), lambda i, j: (i, 0, 0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((n, 1, 1, c), jnp.float32),
        ],
    )(x)
    return y, (xhat, rstd)


def _pallas_bwd(res, dy):
    xhat, rstd = res
    n, h, w, c = dy.shape
    grid = (n, c // LANE)
    dx = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h, w, LANE), lambda i, j: (i, 0, 0, j)),
            pl.BlockSpec((1, h, w, LANE), lambda i, j: (i, 0, 0, j)),
            pl.BlockSpec((1, 1, 1, LANE), lambda i, j: (i, 0, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, h, w, LANE), lambda i, j: (i, 0, 0, j)),
        out_shape=jax.ShapeDtypeStruct(dy.shape, dy.dtype),
    )(dy, xhat, rstd)
    return (dx,)


def _pallas_fwd_only(x, eps):
    n, h, w, c = x.shape
    return pl.pallas_call(
        functools.partial(_fwd_only_kernel, eps=eps),
        grid=(n, c // LANE),
        in_specs=[pl.BlockSpec((1, h, w, LANE), lambda i, j: (i, 0, 0, j))],
        out_specs=pl.BlockSpec((1, h, w, LANE), lambda i, j: (i, 0, 0, j)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _instance_norm_p(x, eps):
    # primal (runs when nothing differentiates through): residual-free
    return _pallas_fwd_only(x, eps)


def _in_fwd(x, eps):
    y, res = _pallas_fwd(x, eps)
    return y, res


def _in_bwd(eps, res, dy):
    return _pallas_bwd(res, dy)


_instance_norm_p.defvjp(_in_fwd, _in_bwd)


def instance_norm_pallas(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Non-affine InstanceNorm over H,W of an NHWC tensor.

    Uses the fused Pallas kernel when the shape tiles onto (lane-aligned C,
    VMEM-resident plane); otherwise falls back to the XLA formulation.
    """
    if x.ndim != 4 or not _tileable(x.shape):
        return _xla_instance_norm(x, eps)
    return _instance_norm_p(x, eps)

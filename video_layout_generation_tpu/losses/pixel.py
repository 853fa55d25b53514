"""Pixel-space losses (fp32 reduction islands).

- ``l1_loss``: mean absolute error (torch nn.L1Loss parity; reference
  src/trainer.py:130,248).
- ``gradient_loss``: L1 between |finite-difference| maps of output and
  target, normalized by the full element count (reference src/loss.py:16-25).
  Works on NHWC; the reference's NCHW dims 2/3 map to our H (-3) and W (-2).
"""

from __future__ import annotations

import jax.numpy as jnp


def l1_loss(output: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    o = output.astype(jnp.float32)
    t = target.astype(jnp.float32)
    return jnp.mean(jnp.abs(o - t))


def gradient_loss(output: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    a = output.astype(jnp.float32)
    b = target.astype(jnp.float32)

    def d(axis, x):
        sl_hi = [slice(None)] * x.ndim
        sl_lo = [slice(None)] * x.ndim
        sl_hi[axis] = slice(1, None)
        sl_lo[axis] = slice(None, -1)
        return jnp.abs(x[tuple(sl_hi)] - x[tuple(sl_lo)])

    xloss = jnp.sum(jnp.abs(d(-3, a) - d(-3, b)))
    yloss = jnp.sum(jnp.abs(d(-2, a) - d(-2, b)))
    return (xloss + yloss) / a.size

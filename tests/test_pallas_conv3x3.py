"""Pallas 3x3 conv kernel vs the XLA conv (interpret mode on CPU).

The kernel targets the packed GridNet row-0 shapes (lane-aligned channels,
reference src/models/modules.py:5-25 executing in space-to-depth form);
correctness must hold for any H (incl. non-divisible tile_h fallback),
both dtypes, and the custom-VJP backward wiring.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from video_layout_generation_tpu.ops.pallas import conv3x3 as m


def _rand(*shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(
        np.float32)


@pytest.fixture
def interp(monkeypatch):
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(pl.pallas_call, interpret=True))


@pytest.mark.parametrize("h,w,tile_h", [(16, 16, 8), (16, 16, 16),
                                        (8, 16, 16), (12, 16, 8)])
def test_conv3x3_pallas_matches_xla(interp, h, w, tile_h):
    x = jnp.asarray(_rand(2, h, w, 128, seed=1))
    k = jnp.asarray(_rand(3, 3, 128, 128, seed=2)) * 0.05
    b = jnp.asarray(_rand(128, seed=3))
    got = m.conv3x3_pallas(x, k, b, tile_h)
    ref = m._xla_conv3x3(x, k, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-3, rtol=1e-4)


def test_conv3x3_pallas_bf16(interp):
    x = jnp.asarray(_rand(1, 16, 16, 128, seed=4)).astype(jnp.bfloat16)
    k = (jnp.asarray(_rand(3, 3, 128, 128, seed=5)) * 0.05).astype(
        jnp.bfloat16)
    b = jnp.asarray(_rand(128, seed=6))
    got = m.conv3x3_pallas(x, k, b, 8)
    ref = m._xla_conv3x3(x, k, b)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               atol=5e-2, rtol=5e-2)


def test_conv3x3_pallas_grad_is_xla_vjp(interp):
    x = jnp.asarray(_rand(1, 8, 8, 128, seed=7))
    k = jnp.asarray(_rand(3, 3, 128, 128, seed=8)) * 0.05
    b = jnp.asarray(_rand(128, seed=9))

    def loss_p(x, k, b):
        return jnp.sum(m.conv3x3_pallas(x, k, b, 8) ** 2)

    def loss_r(x, k, b):
        return jnp.sum(m._xla_conv3x3(x, k, b) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(x, k, b)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, k, b)
    for a, r in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=1e-2, rtol=1e-4)


def test_lane_aligned():
    assert m.lane_aligned(128, 128)
    assert m.lane_aligned(256, 128)
    assert not m.lane_aligned(96, 128)
    assert not m.lane_aligned(128, 20)

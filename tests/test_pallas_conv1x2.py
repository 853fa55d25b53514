"""1x2 width-packed conv: transform exactness + sparse Pallas kernel vs the
standard XLA conv (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from video_layout_generation_tpu.ops.packed import (conv_packed1x2_dense,
                                                    pack1x2,
                                                    pack_kernel3x3_1x2,
                                                    unpack1x2)
from video_layout_generation_tpu.ops.pallas import conv1x2 as m


def _rand(*shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(
        np.float32)


@pytest.fixture
def interp(monkeypatch):
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(pl.pallas_call, interpret=True))


def _conv(x, w, b=None):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y if b is None else y + b


def test_pack1x2_roundtrip():
    x = jnp.asarray(_rand(2, 4, 8, 3))
    np.testing.assert_array_equal(np.asarray(unpack1x2(pack1x2(x))),
                                  np.asarray(x))


def test_dense_1x2_transform_exact():
    # packed-space dense conv == logical conv, exact re-indexing
    x = jnp.asarray(_rand(2, 8, 16, 64, seed=1))
    w = jnp.asarray(_rand(3, 3, 64, 64, seed=2)) * 0.05
    b = jnp.asarray(_rand(64, seed=3))
    ref = _conv(x, w, b)
    got = unpack1x2(conv_packed1x2_dense(pack1x2(x), pack_kernel3x3_1x2(w),
                                         b))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_1x2_kernel_block_sparsity():
    wp = pack_kernel3x3_1x2(jnp.asarray(_rand(3, 3, 64, 64, seed=4)))
    ci = wp.shape[2] // 2
    assert np.all(np.asarray(wp[:, 0, :ci]) == 0)   # qx=-1, dx=0 rows
    assert np.all(np.asarray(wp[:, 2, ci:]) == 0)   # qx=+1, dx=1 rows
    assert np.abs(np.asarray(wp[:, 1])).max() > 0


@pytest.mark.parametrize("h,w,tile_h", [(16, 16, 8), (16, 16, 32),
                                        (12, 8, 8)])
def test_sparse_1x2_matches_xla(interp, h, w, tile_h):
    x = jnp.asarray(_rand(2, h, w, 64, seed=5))
    wl = jnp.asarray(_rand(3, 3, 64, 64, seed=6)) * 0.05
    b = jnp.asarray(_rand(64, seed=7))
    got = m.conv3x3_w1x2(x, wl, b, tile_h)
    ref = _conv(x, wl, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-3, rtol=1e-4)


def test_sparse_1x2_bf16_no_bias(interp):
    x = jnp.asarray(_rand(1, 8, 16, 64, seed=8)).astype(jnp.bfloat16)
    wl = (jnp.asarray(_rand(3, 3, 64, 64, seed=9)) * 0.05).astype(
        jnp.bfloat16)
    got = m.conv3x3_w1x2(x, wl, None, 8)
    ref = _conv(x, wl.astype(jnp.bfloat16))
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               atol=5e-2, rtol=5e-2)


def test_sparse_1x2_rect_channels(interp):
    # Cin=64 -> Cout=128 (2Co=256): rectangular case
    x = jnp.asarray(_rand(1, 8, 8, 64, seed=10))
    wl = jnp.asarray(_rand(3, 3, 64, 128, seed=11)) * 0.05
    b = jnp.asarray(_rand(128, seed=12))
    got = m.conv3x3_w1x2(x, wl, b, 8)
    ref = _conv(x, wl, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-3, rtol=1e-4)


def test_sparse_1x2_grad_is_xla_vjp(interp):
    x = jnp.asarray(_rand(1, 8, 8, 64, seed=13))
    wl = jnp.asarray(_rand(3, 3, 64, 64, seed=14)) * 0.05
    b = jnp.asarray(_rand(64, seed=15))
    gp = jax.grad(lambda a, k, c: jnp.sum(
        m.conv3x3_w1x2(a, k, c, 8) ** 2), argnums=(0, 1, 2))(x, wl, b)
    gr = jax.grad(lambda a, k, c: jnp.sum(
        _conv(a, k, c) ** 2), argnums=(0, 1, 2))(x, wl, b)
    for a, r in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=1e-2, rtol=1e-4)


def test_supported():
    assert m.supported(128, 128, 64, 64)
    assert m.supported(128, 128, 64, 128)
    assert not m.supported(128, 127, 64, 64)    # odd width
    assert not m.supported(128, 128, 96, 96)    # 2C=192 not lane-aligned
    assert not m.supported(128, 128, 64, 32)    # 2Co=64


def test_conv3x3_w2_fwd_and_bwd_match_std():
    # forward: packed == standard conv; backward: exactly the standard
    # conv's VJP (ops/packed.conv3x3_w2)
    from video_layout_generation_tpu.ops.packed import conv3x3_w2
    x = jnp.asarray(_rand(2, 8, 16, 64, seed=40))
    k = jnp.asarray(_rand(3, 3, 64, 64, seed=41)) * 0.05
    b = jnp.asarray(_rand(64, seed=42))
    np.testing.assert_allclose(np.asarray(conv3x3_w2(x, k, b)),
                               np.asarray(_conv(x, k, b)), atol=1e-4)
    gp = jax.grad(lambda *a: jnp.sum(conv3x3_w2(*a) ** 2),
                  argnums=(0, 1, 2))(x, k, b)
    gr = jax.grad(lambda *a: jnp.sum(_conv(*a) ** 2),
                  argnums=(0, 1, 2))(x, k, b)
    for a, r in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=1e-3)

"""Sparse packed-conv Pallas kernel vs the dense XLA packed conv
(interpret mode on CPU).

The kernel assumes the 2x2 space-to-depth packed kernel's block sparsity
(ops/packed.pack_kernel3x3): the qy=-1 tap plane is nonzero only in its
dy=1 input rows and qy=+1 only in dy=0 — asserted here so the kernel's
dropped blocks can never silently carry weight.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from video_layout_generation_tpu.ops.packed import (conv_packed3x3, pack2x2,
                                                    pack_kernel3x3)
from video_layout_generation_tpu.ops.pallas import conv_packed as m


def _rand(*shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(
        np.float32)


@pytest.fixture
def interp(monkeypatch):
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(pl.pallas_call, interpret=True))


def test_packed_kernel_block_sparsity():
    wp = pack_kernel3x3(jnp.asarray(_rand(3, 3, 32, 32, seed=1)))
    c2 = wp.shape[2] // 2
    assert np.all(np.asarray(wp[0, :, :c2]) == 0)   # qy=-1, dy=0 rows
    assert np.all(np.asarray(wp[2, :, c2:]) == 0)   # qy=+1, dy=1 rows
    # and per qx: the planes this kernel keeps are not all zero
    assert np.abs(np.asarray(wp[1])).max() > 0


@pytest.mark.parametrize("h,w,tile_h", [(16, 16, 8), (16, 16, 16),
                                        (8, 16, 16), (12, 16, 8)])
def test_sparse_matches_dense_packed(interp, h, w, tile_h):
    x = jnp.asarray(_rand(2, 2 * h, 2 * w, 32, seed=2))
    wl = jnp.asarray(_rand(3, 3, 32, 32, seed=3)) * 0.05
    b = jnp.asarray(_rand(32, seed=4))
    xp = pack2x2(x)
    wp = pack_kernel3x3(wl)
    got = m.conv_packed3x3_sparse(xp, wp, b, tile_h)
    ref = conv_packed3x3(xp, wp, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-3, rtol=1e-4)


def test_sparse_no_bias_and_bf16(interp):
    x = jnp.asarray(_rand(1, 32, 32, 32, seed=5)).astype(jnp.bfloat16)
    wl = (jnp.asarray(_rand(3, 3, 32, 32, seed=6)) * 0.05).astype(
        jnp.bfloat16)
    xp = pack2x2(x)
    wp = pack_kernel3x3(wl)
    got = m.conv_packed3x3_sparse(xp, wp, None, 8)
    ref = conv_packed3x3(xp, wp, None)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               atol=5e-2, rtol=5e-2)


def test_sparse_wider_channels(interp):
    # 4Ci = 256 (logical C=64): exercises the 2-lane-tile operand path
    x = jnp.asarray(_rand(1, 16, 16, 64, seed=7))
    wl = jnp.asarray(_rand(3, 3, 64, 32, seed=8)) * 0.05
    b = jnp.asarray(_rand(32, seed=9))
    xp = pack2x2(x)
    wp = pack_kernel3x3(wl)
    got = m.conv_packed3x3_sparse(xp, wp, b, 8)
    ref = conv_packed3x3(xp, wp, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-3, rtol=1e-4)


def test_sparse_grad_is_dense_vjp(interp):
    x = jnp.asarray(_rand(1, 16, 16, 32, seed=10))
    wl = jnp.asarray(_rand(3, 3, 32, 32, seed=11)) * 0.05
    b = jnp.asarray(_rand(32, seed=12))
    xp = pack2x2(x)
    wp = pack_kernel3x3(wl)

    gp = jax.grad(lambda a, w, c: jnp.sum(
        m.conv_packed3x3_sparse(a, w, c, 8) ** 2), argnums=(0, 1, 2))(
            xp, wp, b)
    gr = jax.grad(lambda a, w, c: jnp.sum(
        conv_packed3x3(a, w, c) ** 2), argnums=(0, 1, 2))(xp, wp, b)
    for a, r in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=1e-2, rtol=1e-4)


def test_supported():
    assert m.supported(128, 128)
    assert m.supported(256, 128)
    assert not m.supported(160, 128)    # coord-augmented input
    assert not m.supported(128, 80)     # seg head (4*20)


def _prelu_np(x, a):
    return jnp.where(x >= 0, x, a * x)


def test_fused_prelu_conv_matches_composition(interp):
    from video_layout_generation_tpu.ops.pallas.conv_packed import (
        prelu_conv_packed3x3)
    x = jnp.asarray(_rand(2, 16, 16, 32, seed=20))
    wl = jnp.asarray(_rand(3, 3, 32, 32, seed=21)) * 0.05
    b = jnp.asarray(_rand(32, seed=22))
    alpha = jnp.asarray(0.25, jnp.float32)
    xp = pack2x2(x)
    wp = pack_kernel3x3(wl)
    got = prelu_conv_packed3x3(xp, wp, b, alpha, 8)
    ref = conv_packed3x3(_prelu_np(xp, alpha.astype(xp.dtype)), wp, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-3, rtol=1e-4)


def test_fused_prelu_conv_res_matches_composition(interp):
    from video_layout_generation_tpu.ops.pallas.conv_packed import (
        prelu_conv_packed3x3_res)
    x = jnp.asarray(_rand(1, 16, 16, 32, seed=23))
    wl = jnp.asarray(_rand(3, 3, 32, 32, seed=24)) * 0.05
    b = jnp.asarray(_rand(32, seed=25))
    alpha = jnp.asarray(0.1, jnp.float32)
    xp = pack2x2(x)
    wp = pack_kernel3x3(wl)
    r = jnp.asarray(_rand(1, 8, 8, 128, seed=26))
    got = prelu_conv_packed3x3_res(xp, wp, b, alpha, r, 8)
    ref = conv_packed3x3(_prelu_np(xp, alpha.astype(xp.dtype)), wp, b) + r
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-3, rtol=1e-4)


def test_fused_prelu_conv_grads(interp):
    from video_layout_generation_tpu.ops.pallas.conv_packed import (
        prelu_conv_packed3x3_res)
    x = jnp.asarray(_rand(1, 8, 8, 32, seed=27))
    wl = jnp.asarray(_rand(3, 3, 32, 32, seed=28)) * 0.05
    b = jnp.asarray(_rand(32, seed=29))
    alpha = jnp.asarray(0.2, jnp.float32)
    xp = pack2x2(x)
    wp = pack_kernel3x3(wl)
    r = jnp.asarray(_rand(1, 4, 4, 128, seed=30))

    gp = jax.grad(lambda a_, w_, b_, al_, r_: jnp.sum(
        prelu_conv_packed3x3_res(a_, w_, b_, al_, r_, 8) ** 2),
        argnums=(0, 1, 2, 3, 4))(xp, wp, b, alpha, r)
    gr = jax.grad(lambda a_, w_, b_, al_, r_: jnp.sum(
        (conv_packed3x3(_prelu_np(a_, al_.astype(a_.dtype)), w_, b_)
         + r_) ** 2), argnums=(0, 1, 2, 3, 4))(xp, wp, b, alpha, r)
    for a, rr in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(rr),
                                   atol=1e-2, rtol=1e-3)


def test_packed_executor_residual_plumbing_cpu():
    # the XLA fallback path must add `residual` exactly like the old
    # two-term formulation (grid fusion, reference src/models/gridnet.py:43-58)
    from video_layout_generation_tpu.models import fast_gridnet as fg
    p = {
        "PReLU_0": {"alpha": jnp.asarray(0.25)},
        "PReLU_1": {"alpha": jnp.asarray(0.25)},
        "Conv_0": {"kernel": jnp.asarray(_rand(3, 3, 8, 8, seed=31)) * 0.1,
                   "bias": jnp.asarray(_rand(8, seed=32))},
        "Conv_1": {"kernel": jnp.asarray(_rand(3, 3, 8, 8, seed=33)) * 0.1,
                   "bias": jnp.asarray(_rand(8, seed=34))},
    }
    xp = jnp.asarray(_rand(1, 8, 8, 32, seed=35))
    r = jnp.asarray(_rand(1, 8, 8, 32, seed=36))
    got = fg._lateral_packed(p, xp, residual=r)
    ref = fg._lateral_packed(p, xp) + r
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_fused_lateral_matches_xla_chain(interp):
    """Whole-lateral kernel (prelu->conv->prelu->conv [+res]) vs the XLA
    packed chain, fp32, including image edges across tile boundaries."""
    ci = 32
    x = jnp.asarray(_rand(2, 16, 16, ci, seed=3))
    xp = pack2x2(x)
    w0 = pack_kernel3x3(jnp.asarray(_rand(3, 3, ci, ci, seed=4)) * 0.2)
    w1 = pack_kernel3x3(jnp.asarray(_rand(3, 3, ci, ci, seed=5)) * 0.2)
    b0 = jnp.asarray(_rand(ci, seed=6) * 0.1)
    b1 = jnp.asarray(_rand(ci, seed=7) * 0.1)
    a0 = jnp.asarray(0.25)
    a1 = jnp.asarray(0.1)
    res = pack2x2(jnp.asarray(_rand(2, 16, 16, ci, seed=8)))

    def prelu(z, a):
        return jnp.where(z >= 0, z, a * z)

    ref = conv_packed3x3(prelu(xp, a0), w0, b0)
    ref = conv_packed3x3(prelu(ref, a1), w1, b1)

    out = m.fused_lateral_packed3x3(xp, w0, b0, a0, w1, b1, a1, None,
                                    tile_h=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)

    out_r = m.fused_lateral_packed3x3(xp, w0, b0, a0, w1, b1, a1, res,
                                      tile_h=4)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(ref + res),
                               atol=2e-4, rtol=2e-4)


def test_fused_lateral_gradients_match(interp):
    """Backward defers to the XLA chain: grads must match exactly."""
    ci = 32
    x = jnp.asarray(_rand(1, 8, 8, ci, seed=9))
    xp = pack2x2(x)
    w0 = pack_kernel3x3(jnp.asarray(_rand(3, 3, ci, ci, seed=10)) * 0.2)
    w1 = pack_kernel3x3(jnp.asarray(_rand(3, 3, ci, ci, seed=11)) * 0.2)
    b0 = jnp.asarray(_rand(ci, seed=12) * 0.1)
    b1 = jnp.asarray(_rand(ci, seed=13) * 0.1)
    a0, a1 = jnp.asarray(0.25), jnp.asarray(0.1)

    def prelu(z, a):
        return jnp.where(z >= 0, z, a * z)

    def f_ref(xp_):
        y = conv_packed3x3(prelu(xp_, a0), w0, b0)
        return conv_packed3x3(prelu(y, a1), w1, b1).sum()

    def f_ker(xp_):
        return m.fused_lateral_packed3x3(xp_, w0, b0, a0, w1, b1, a1,
                                         None, tile_h=4).sum()

    g_ref = jax.grad(f_ref)(xp)
    g_ker = jax.grad(f_ker)(xp)
    np.testing.assert_allclose(np.asarray(g_ker), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-4)

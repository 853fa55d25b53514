"""Pallas kernels vs XLA reference implementations (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_layout_generation_tpu.ops.pallas.instance_norm import (
    _tileable, _xla_instance_norm, instance_norm_pallas)


def _rand(*shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(
        np.float32)


def test_instance_norm_fallback_matches_module():
    from video_layout_generation_tpu.models.norms import InstanceNorm
    x = jnp.asarray(_rand(2, 8, 8, 5))
    ref = InstanceNorm().apply({}, x)
    got = instance_norm_pallas(x)  # non-tileable -> XLA path
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_instance_norm_pallas_kernel_interpret(dtype, monkeypatch):
    # force the pallas path in interpret mode on CPU
    from video_layout_generation_tpu.ops.pallas import instance_norm as m
    import functools
    from jax.experimental import pallas as pl
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(orig, interpret=True))
    x = jnp.asarray(_rand(2, 8, 8, 256, seed=1)).astype(dtype)
    assert _tileable(x.shape)
    got = m._pallas_fwd(x, 1e-5)[0]
    ref = _xla_instance_norm(x, 1e-5)
    atol = 1e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), atol=atol)


def test_instance_norm_pallas_grad_interpret(monkeypatch):
    from video_layout_generation_tpu.ops.pallas import instance_norm as m
    import functools
    from jax.experimental import pallas as pl
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(orig, interpret=True))
    x = jnp.asarray(_rand(1, 8, 8, 128, seed=2))
    g_ref = jax.grad(lambda z: jnp.sum(_xla_instance_norm(z, 1e-5) ** 2))(x)
    g_got = jax.grad(lambda z: jnp.sum(m._instance_norm_p(z, 1e-5) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               atol=1e-4)


def test_ssim_pallas_matches_xla_interpret(monkeypatch):
    import functools
    from jax.experimental import pallas as pl
    from video_layout_generation_tpu.ops.pallas import ssim as m
    from video_layout_generation_tpu.losses.ssim import ssim_loss
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(orig, interpret=True))
    x = jnp.asarray(np.clip(_rand(2, 16, 16, 3, seed=7) * .2 + .5, 0, 1))
    y = jnp.asarray(np.clip(_rand(2, 16, 16, 3, seed=8) * .2 + .5, 0, 1))
    ours = float(m._ssim_pallas_fwd_impl(x, y))
    ref = float(ssim_loss(x, y, use_pallas=False))
    assert abs(ours - ref) < 1e-5


def test_ssim_pallas_grad_matches_xla(monkeypatch):
    import functools
    from jax.experimental import pallas as pl
    from video_layout_generation_tpu.ops.pallas import ssim as m
    from video_layout_generation_tpu.losses.ssim import ssim_loss
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(orig, interpret=True))
    x = jnp.asarray(np.clip(_rand(1, 12, 12, 2, seed=9) * .2 + .5, 0, 1))
    y = jnp.asarray(np.clip(_rand(1, 12, 12, 2, seed=10) * .2 + .5, 0, 1))
    g_p = jax.grad(lambda a: m.ssim_loss_pallas(a, y))(x)
    g_x = jax.grad(lambda a: ssim_loss(a, y, use_pallas=False))(x)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), atol=1e-5)

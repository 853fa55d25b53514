"""Posterior-collapse remedies for the plain VAE (VERDICT r2 #4):
free-bits KL floor, Burgess capacity objective, cyclical beta annealing,
class-weighted reconstruction CE (losses/vae.py, train/vae_steps.py).

Invariants: defaults are the plain ELBO bit-exactly; each remedy changes
the objective by its documented formula; the LayoutTrainer plumbing trains
end to end with every remedy on.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_layout_generation_tpu.losses.ce import (class_weighted_ce,
                                                   cross_entropy_loss)
from video_layout_generation_tpu.losses.vae import (
    kl_standard_normal, kl_standard_normal_free_bits, vae_loss)
from video_layout_generation_tpu.train.vae_steps import (capacity_schedule,
                                                         kl_anneal)


def _toy(seed=0, n=2, hw=8, c=5, d=4):
    rng = np.random.default_rng(seed)
    logits = jnp.asarray(rng.normal(size=(n, hw, hw, c)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, c, (n, hw, hw)), jnp.int32)
    mu = jnp.asarray(rng.normal(size=(n, 2, 2, d)), jnp.float32)
    lv = jnp.asarray(rng.normal(size=(n, 2, 2, d)) * 0.5, jnp.float32)
    return logits, ids, mu, lv


def test_defaults_are_plain_elbo():
    logits, ids, mu, lv = _toy()
    total, m = vae_loss(logits, ids, mu, lv, beta=0.7)
    expect = (cross_entropy_loss(logits, ids)
              + 0.7 * kl_standard_normal(mu, lv))
    np.testing.assert_allclose(float(total), float(expect), rtol=1e-6)
    assert float(m["kl"]) == pytest.approx(float(kl_standard_normal(mu, lv)))


def test_free_bits_floor_and_raw_kl():
    """kl_used = sum_d max(kl_d, fb) >= kl_raw, with equality iff no dim is
    below the floor; a collapsed posterior (mu=0, lv=0) reports kl_raw=0
    but contributes the constant D*fb with ZERO gradient into the encoder."""
    logits, ids, mu, lv = _toy()
    fb = 0.5
    used, raw = kl_standard_normal_free_bits(mu, lv, fb)
    np.testing.assert_allclose(float(raw),
                               float(kl_standard_normal(mu, lv)), rtol=1e-6)
    assert float(used) >= float(raw) - 1e-6
    # collapsed posterior: every per-dim KL is 0 < fb
    z = jnp.zeros_like(mu)
    used0, raw0 = kl_standard_normal_free_bits(z, jnp.zeros_like(lv), fb)
    d = int(np.prod(mu.shape[1:]))
    assert float(raw0) == pytest.approx(0.0, abs=1e-6)
    assert float(used0) == pytest.approx(d * fb, rel=1e-6)
    # and the clamped term is gradient-dead: no pressure to collapse further
    g = jax.grad(lambda m_: kl_standard_normal_free_bits(
        m_, jnp.zeros_like(lv), fb)[0])(z)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)

    total, metrics = vae_loss(logits, ids, z, jnp.zeros_like(lv), beta=1.0,
                              free_bits=fb)
    assert float(metrics["kl"]) == pytest.approx(0.0, abs=1e-6)  # raw
    expect = cross_entropy_loss(logits, ids) + d * fb
    np.testing.assert_allclose(float(total), float(expect), rtol=1e-6)


def test_capacity_objective():
    logits, ids, mu, lv = _toy()
    c = 3.0
    total, m = vae_loss(logits, ids, mu, lv, beta=2.0, capacity=c)
    kl = float(kl_standard_normal(mu, lv))
    expect = float(cross_entropy_loss(logits, ids)) + 2.0 * abs(kl - c)
    np.testing.assert_allclose(float(total), expect, rtol=1e-6)


def test_class_weighted_ce_uniform_equals_plain():
    logits, ids, _, _ = _toy()
    w = jnp.ones((5,))
    np.testing.assert_allclose(float(class_weighted_ce(logits, ids, w)),
                               float(cross_entropy_loss(logits, ids)),
                               rtol=1e-6)


def test_class_weighted_ce_masks_background():
    """weight 0 on class 0 == mean CE over only the non-0 pixels."""
    logits, ids, _, _ = _toy(seed=3)
    w = jnp.asarray([0.0, 1.0, 1.0, 1.0, 1.0])
    got = float(class_weighted_ce(logits, ids, w))
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = np.take_along_axis(np.asarray(logp),
                                np.asarray(ids)[..., None], axis=-1)[..., 0]
    mask = np.asarray(ids) != 0
    expect = float((-picked * mask).sum() / mask.sum())
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_cyclical_anneal_shape():
    # linear default unchanged
    assert kl_anneal(500, 1000, 1.0) == pytest.approx(0.5)
    # cyclical: ramp over first half of each cycle, hold at beta_max after
    assert kl_anneal(0, 1000, 1.0, cycle_steps=100) == 0.0
    assert kl_anneal(25, 1000, 1.0, cycle_steps=100) == pytest.approx(0.5)
    assert kl_anneal(50, 1000, 1.0, cycle_steps=100) == pytest.approx(1.0)
    assert kl_anneal(75, 1000, 1.0, cycle_steps=100) == pytest.approx(1.0)
    # re-opens at the next cycle boundary
    assert kl_anneal(100, 1000, 1.0, cycle_steps=100) == 0.0


def test_capacity_schedule():
    assert capacity_schedule(0, 10.0, 100) == 0.0
    assert capacity_schedule(50, 10.0, 100) == pytest.approx(5.0)
    assert capacity_schedule(500, 10.0, 100) == 10.0


@pytest.mark.parametrize("remedy", ["free_bits", "capacity", "cyclical",
                                    "bg_weight", "all"])
def test_layout_trainer_remedies_e2e(tmp_path, remedy):
    """LayoutTrainer plumbing: each remedy (and all together) trains the
    vae family end to end with finite metrics."""
    from video_layout_generation_tpu.config import Config
    from video_layout_generation_tpu.train.layout_trainer import \
        LayoutTrainer
    kw = {}
    if remedy in ("free_bits", "all"):
        kw["free_bits"] = 0.05
    if remedy in ("capacity", "all"):
        kw.update(capacity_max=5.0, capacity_steps=10)
    if remedy in ("cyclical", "all"):
        kw["kl_cycle_steps"] = 4
    if remedy in ("bg_weight", "all"):
        kw["bg_weight"] = 0.1
    cfg = Config(dataset="synthetic", synthetic_train_size=8,
                 synthetic_val_size=4, image_size=(32, 32), batch_size=4,
                 epochs=1, compute_dtype="float32", workers=1,
                 mesh_shape=(1,), path=str(tmp_path), rollout_frames=2)
    t = LayoutTrainer(cfg, family="vae", latent_dim=8, beta_max=0.1,
                      **kw)
    tr = t.train_epoch()
    assert np.isfinite(tr["loss"]) and np.isfinite(tr["kl"])
    val = t.validate()
    assert np.isfinite(val["miou"])

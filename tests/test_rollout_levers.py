"""Rollout-fidelity levers (round-3): per-step discounted loss weights and
feedback-noise injection inside the K-step objective (train/multistep.py),
and scheduled sampling for single-step training (train/scheduled.py).

Invariants: defaults (discount=1, noise=0, p=0) are exactly the original
objectives; the discount reweights the per-step losses by the documented
formula; every lever trains with finite losses and moving params.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_layout_generation_tpu.config import Config
from video_layout_generation_tpu.losses.combined import CombinedLoss
from video_layout_generation_tpu.models import GridNet
from video_layout_generation_tpu.train.multistep import (
    make_multistep_train_step, window_to_triplet_batch)
from video_layout_generation_tpu.train.scheduled import (
    make_scheduled_train_step, scheduled_p)
from video_layout_generation_tpu.train.state import TrainState, make_optimizer
from video_layout_generation_tpu.train.steps import make_train_step

_HW = 32


def _window_batch(n=2, t=4, seed=0):
    rng = np.random.default_rng(seed)
    imgs = rng.random((n, t, _HW, _HW, 3)).astype(np.float32)
    segs = rng.integers(0, 20, (n, t, _HW, _HW)).astype(np.int32)
    return {"imgs": imgs, "segs": segs}


def _setup(n_channels=8):
    model = GridNet(n_channels=n_channels, dtype=None,
                    filters_level=(4, 6, 8))
    params = model.init(jax.random.key(0),
                        jnp.zeros((1, _HW, _HW, n_channels), jnp.float32))
    state = TrainState.create(params, make_optimizer("adam", 1e-3, 0.5))
    combined = CombinedLoss.create(None, None, image_hw=(_HW, _HW))
    return model, state, combined


def test_discount_one_noise_zero_is_default():
    """discount=1 + noise=0 must be bit-identical to the unmodified call
    (the step-weight vector is all ones and the noise branch is traced
    out)."""
    model, state, combined = _setup()
    win = _window_batch(t=4, seed=1)
    rng = jax.random.key(3)
    s_a, m_a = make_multistep_train_step(model.apply, None, combined, k=2,
                                         donate=False)(state, None, win, rng)
    s_b, m_b = make_multistep_train_step(model.apply, None, combined, k=2,
                                         donate=False, discount=1.0,
                                         feedback_noise=0.0)(
        state, None, win, rng)
    np.testing.assert_array_equal(float(m_a["loss"]), float(m_b["loss"]))
    for a, b in zip(jax.tree_util.tree_leaves(s_a.params),
                    jax.tree_util.tree_leaves(s_b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_discount_reweights_late_steps():
    """total == mean_i(w_i * loss_per_step_i) with w_i = d**(K-1-i)
    normalized to mean 1 — late steps carry the largest weight."""
    model, state, combined = _setup()
    win = _window_batch(t=5, seed=2)
    d = 0.5
    k = 3
    step = make_multistep_train_step(model.apply, None, combined, k=k,
                                     donate=False, discount=d)
    _, m = step(state, None, win, jax.random.key(4))
    w = np.asarray([d ** (k - 1 - i) for i in range(k)], np.float32)
    w = w / w.mean()
    assert w[-1] > w[0]  # late steps up-weighted
    per_step = np.asarray(m["loss_per_step"], np.float32)  # unweighted
    np.testing.assert_allclose(float(m["loss"]),
                               float(np.mean(w * per_step)), rtol=1e-5)


def test_feedback_noise_trains_and_perturbs():
    """noise > 0: the objective changes (different loss than noise=0), all
    params still move, loss finite."""
    model, state, combined = _setup()
    win = _window_batch(t=4, seed=5)
    rng = jax.random.key(6)
    _, m0 = make_multistep_train_step(model.apply, None, combined, k=2,
                                      donate=False)(state, None, win, rng)
    s_n, m_n = make_multistep_train_step(model.apply, None, combined, k=2,
                                         donate=False, feedback_noise=0.1)(
        state, None, win, rng)
    assert np.isfinite(float(m_n["loss"]))
    assert float(m_n["loss"]) != float(m0["loss"])
    moved = [not np.array_equal(np.asarray(a), np.asarray(b))
             for a, b in zip(jax.tree_util.tree_leaves(state.params),
                             jax.tree_util.tree_leaves(s_n.params))]
    assert all(moved)


def _find_rng_scheduled_vs_ref(want_coin: bool):
    """rng where BOTH the scheduled step's flip coin (second split half)
    and the reference step's coin (raw rng) agree with want_coin."""
    for i in range(200):
        cand = jax.random.key(300 + i)
        _, rng_flip = jax.random.split(cand)
        if bool(jax.random.bernoulli(rng_flip)) == want_coin:
            return cand, rng_flip
    raise AssertionError("no rng found")


@pytest.mark.parametrize("use_edges", [False, True])
def test_scheduled_p0_equals_teacher_forced(use_edges):
    """p=0: the mixing mask is all-False, so the student step IS the
    teacher-forced single-step objective on the window's last triplet.
    Loss must match make_train_step exactly (same coin forced)."""
    n_ch = 10 if use_edges else 8
    model, state, combined = _setup(n_channels=n_ch)
    if use_edges:
        from video_layout_generation_tpu.models import HNED
        hned = HNED(dtype=None)
        hp = hned.init(jax.random.key(1),
                       jnp.zeros((1, _HW, _HW, 3), jnp.float32))
        happly = hned.apply
    else:
        happly, hp = None, None
    win = _window_batch(t=4, seed=7)
    # the student step trains on the window's LAST triplet (frames 1..3)
    trip = window_to_triplet_batch(
        {"imgs": win["imgs"][:, 1:], "segs": win["segs"][:, 1:]})

    ss_step = make_scheduled_train_step(model.apply, happly, combined,
                                        donate=False)
    ref_step = make_train_step(model.apply, happly, combined, donate=False)

    rng_ss, rng_ref = _find_rng_scheduled_vs_ref(want_coin=False)
    s_a, m_a = ss_step(state, hp, win, rng_ss, jnp.float32(0.0))
    s_b, m_b = ref_step(state, hp, trip, rng_ref)
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_a.params),
                    jax.tree_util.tree_leaves(s_b.params)):
        # where(all-False) still routes the teacher forward through the
        # graph as dead code; Adam amplifies fp reassociation noise
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_scheduled_p1_trains_on_own_predictions():
    """p=1: every example feeds back the model's own prediction; the loss
    differs from teacher-forced, params all move, grads finite."""
    model, state, combined = _setup()
    win = _window_batch(t=4, seed=8)
    ss_step = make_scheduled_train_step(model.apply, None, combined,
                                        donate=False)
    rng = jax.random.key(9)
    s0, m0 = ss_step(state, None, win, rng, jnp.float32(0.0))
    s1, m1 = ss_step(state, None, win, rng, jnp.float32(1.0))
    assert np.isfinite(float(m1["loss"]))
    assert float(m1["loss"]) != float(m0["loss"])
    moved = [not np.array_equal(np.asarray(a), np.asarray(b))
             for a, b in zip(jax.tree_util.tree_leaves(state.params),
                             jax.tree_util.tree_leaves(s1.params))]
    assert all(moved)


def test_scheduled_p_is_traced_not_compiled():
    """Changing p must NOT recompile (the Trainer's epoch ramp relies on
    this): same compiled callable, different p values, both run."""
    model, state, combined = _setup()
    win = _window_batch(t=4, seed=10)
    ss_step = make_scheduled_train_step(model.apply, None, combined,
                                        donate=False)
    rng = jax.random.key(11)
    ss_step(state, None, win, rng, jnp.float32(0.25))
    n_before = ss_step._cache_size()
    ss_step(state, None, win, rng, jnp.float32(0.75))
    assert ss_step._cache_size() == n_before


def test_scheduled_p_ramp():
    assert scheduled_p(0, 0.5, 0) == 0.5
    assert scheduled_p(0, 0.5, 5) == pytest.approx(0.1)
    assert scheduled_p(4, 0.5, 5) == pytest.approx(0.5)
    assert scheduled_p(9, 0.5, 5) == 0.5


def test_trainer_scheduled_sampling_e2e(tmp_path):
    """Trainer wiring: scheduled sampling forces 4-frame windows through
    the data factory and trains one epoch end to end with the ramp."""
    from video_layout_generation_tpu.train import Trainer
    cfg = Config(dataset="synthetic", synthetic_train_size=8,
                 synthetic_val_size=4, image_size=(_HW, _HW), batch_size=4,
                 epochs=2, edge=False, arch="GridNet",
                 scheduled_sampling=0.5, scheduled_ramp=2,
                 filters_level=(4, 6, 8), compute_dtype="float32",
                 workers=2, mesh_shape=(1,), path=str(tmp_path),
                 rollout_frames=2)
    t = Trainer(cfg)
    m = t.fit()
    assert np.isfinite(m["loss"])
    assert t._ss_p == pytest.approx(0.5)  # ramp completed


def test_scheduled_excludes_multistep():
    cfg = Config(dataset="synthetic", synthetic_train_size=4,
                 synthetic_val_size=4, image_size=(_HW, _HW), batch_size=4,
                 epochs=1, edge=False, multistep_k=2, scheduled_sampling=0.5,
                 filters_level=(4, 6, 8), compute_dtype="float32", workers=1,
                 mesh_shape=(1,), path=None, rollout_frames=2)
    from video_layout_generation_tpu.train import Trainer
    with pytest.raises(ValueError, match="pick one"):
        Trainer(cfg)

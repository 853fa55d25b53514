"""K-step exposure training for the layout families (VERDICT r4 #5).

The anti-drift levers proven on the flagship (train/multistep.py) ported
to the CVAE / ConvLSTM layout families (train/vae_steps.py). Contracts:
K=1 is BIT-IDENTICAL to the single-step steps; K>1 trains through the
model's own fed-back argmax predictions; layout_noise=0 is exact; the
LayoutTrainer consumes the K+2-frame window contract end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_layout_generation_tpu.config import Config
from video_layout_generation_tpu.models.convlstm import (
    ConvLSTMLayoutPredictor)
from video_layout_generation_tpu.models.vae import LayoutCVAE
from video_layout_generation_tpu.train.layout_trainer import LayoutTrainer
from video_layout_generation_tpu.train.state import (TrainState,
                                                     make_optimizer)
from video_layout_generation_tpu.train.vae_steps import (
    make_convlstm_multistep_train_step, make_convlstm_train_step,
    make_cvae_multistep_train_step, make_cvae_train_step)

N_CLS = 8
HW = 16


def _cvae_state(seed=0):
    model = LayoutCVAE(N_CLS, latent_dim=8)
    params = jax.jit(model.init)(jax.random.key(seed),
                                 jnp.zeros((1, HW, HW, 2 * N_CLS)),
                                 jnp.zeros((1, HW, HW, N_CLS)),
                                 jax.random.key(1))
    return model, TrainState.create(params,
                                    make_optimizer("adam", 1e-3, 0.9))


def _window(n=4, t=4, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, N_CLS, (n, t, HW, HW)), jnp.int32)


def test_cvae_k1_bit_identical_to_single_step():
    model, state = _cvae_state()
    segs = _window(t=3)
    rng = jax.random.key(7)

    ctx = jnp.stack([segs[:, 0], segs[:, 1]], axis=1)
    s_ref, m_ref = make_cvae_train_step(model, N_CLS, donate=False)(
        state, ctx, segs[:, 2], rng, 0.3)
    s_k1, m_k1 = make_cvae_multistep_train_step(model, N_CLS, k=1,
                                                donate=False)(
        state, segs, rng, 0.3)

    assert float(m_ref["loss"]) == float(m_k1["loss"])
    for a, b in zip(jax.tree_util.tree_leaves(s_ref.params),
                    jax.tree_util.tree_leaves(s_k1.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_convlstm_k1_bit_identical_to_single_step():
    model = ConvLSTMLayoutPredictor(N_CLS, hidden=8)
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, 2, HW, HW, N_CLS)))
    state = TrainState.create(params, make_optimizer("adam", 1e-3, 0.9))
    segs = _window(t=3, seed=1)

    ctx = jnp.stack([segs[:, 0], segs[:, 1]], axis=1)
    s_ref, m_ref = make_convlstm_train_step(model, N_CLS, donate=False)(
        state, ctx, segs[:, 2])
    s_k1, m_k1 = make_convlstm_multistep_train_step(model, N_CLS, k=1,
                                                    donate=False)(
        state, segs, jax.random.key(9))

    assert float(m_ref["loss"]) == float(m_k1["loss"])
    for a, b in zip(jax.tree_util.tree_leaves(s_ref.params),
                    jax.tree_util.tree_leaves(s_k1.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("feedback", ["prior", "posterior"])
def test_cvae_k2_trains_and_reaches_all_params(feedback):
    model, state = _cvae_state()
    segs = _window(t=4, seed=2)
    step = make_cvae_multistep_train_step(model, N_CLS, k=2, donate=False,
                                          feedback=feedback)
    new_state, metrics = step(state, segs, jax.random.key(3), 0.3)
    assert np.isfinite(float(metrics["loss"]))
    # every parameter moved: the exposure objective still reaches the
    # posterior (step losses), prior, decoder, and context trunk
    moved = [not np.array_equal(np.asarray(a), np.asarray(b))
             for a, b in zip(jax.tree_util.tree_leaves(state.params),
                             jax.tree_util.tree_leaves(new_state.params))]
    assert all(moved), f"{moved.count(False)} params untouched"


def test_cvae_layout_noise_zero_exact_positive_differs():
    model, state = _cvae_state()
    segs = _window(t=4, seed=3)
    rng = jax.random.key(4)
    base = make_cvae_multistep_train_step(model, N_CLS, k=2, donate=False)
    noise0 = make_cvae_multistep_train_step(model, N_CLS, k=2,
                                            donate=False, layout_noise=0.0)
    noisy = make_cvae_multistep_train_step(model, N_CLS, k=2, donate=False,
                                           layout_noise=0.5)
    _, m_base = base(state, segs, rng, 0.3)
    _, m_zero = noise0(state, segs, rng, 0.3)
    _, m_noisy = noisy(state, segs, rng, 0.3)
    assert float(m_base["loss"]) == float(m_zero["loss"])
    assert float(m_noisy["loss"]) != float(m_base["loss"])


def test_layout_trainer_multistep_e2e(tmp_path):
    """cfg.multistep_k=2 flows through get_dataset (4-frame windows) into
    the K-step steps for both autoregressive families."""
    for family in ("cvae", "convlstm"):
        cfg = Config(dataset="synthetic", synthetic_train_size=8,
                     synthetic_val_size=4, image_size=(HW, HW),
                     n_classes=N_CLS, batch_size=4, epochs=1,
                     compute_dtype="float32", workers=1,
                     path=str(tmp_path / family), mesh_shape=(1,),
                     rollout_frames=2, lr=1e-3, multistep_k=2,
                     multistep_layout_noise=0.05)
        t = LayoutTrainer(cfg, family=family, latent_dim=8, hidden=8,
                          kl_warmup_steps=10)
        m = t.fit()
        assert 0.0 <= m["miou"] <= 1.0
        assert t.global_step == 2


def test_layout_trainer_vae_multistep_rejected(tmp_path):
    cfg = Config(dataset="synthetic", synthetic_train_size=8,
                 synthetic_val_size=4, image_size=(HW, HW),
                 n_classes=N_CLS, batch_size=4, epochs=1,
                 compute_dtype="float32", workers=1, path=str(tmp_path),
                 mesh_shape=(1,), rollout_frames=2, multistep_k=2)
    with pytest.raises(ValueError, match="autoregressive"):
        LayoutTrainer(cfg, family="vae", latent_dim=8)


def test_layout_trainer_ckpt_warm_start(tmp_path):
    """Weights-only warm start (objective-switch recipe): params carry
    over, optimizer/epoch are fresh."""
    cfg = Config(dataset="synthetic", synthetic_train_size=8,
                 synthetic_val_size=4, image_size=(HW, HW),
                 n_classes=N_CLS, batch_size=4, epochs=1,
                 compute_dtype="float32", workers=1,
                 path=str(tmp_path / "base"), mesh_shape=(1,),
                 rollout_frames=2, lr=1e-3)
    t = LayoutTrainer(cfg, family="cvae", latent_dim=8)
    t.fit()

    ck = str(tmp_path / "base" / "checkpoint" / "001")
    cfg2 = cfg.replace(path=str(tmp_path / "ft"), ckpt=ck, multistep_k=2)
    t2 = LayoutTrainer(cfg2, family="cvae", latent_dim=8)
    assert t2.epoch == 0 and t2.global_step == 0
    for a, b in zip(jax.tree_util.tree_leaves(t.state.params),
                    jax.tree_util.tree_leaves(t2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

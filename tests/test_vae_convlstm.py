"""VAE / CVAE / ConvLSTM layout families (BASELINE.json configs 1-3):
shape contracts, loss golden values, learning smoke, rollout."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from video_layout_generation_tpu.losses.vae import (kl_gaussians,
                                                    kl_standard_normal)
from video_layout_generation_tpu.models.convlstm import (
    ConvLSTMLayoutPredictor)
from video_layout_generation_tpu.models.vae import (LayoutCVAE, LayoutVAE,
                                                    make_cvae_rollout)
from video_layout_generation_tpu.train.state import TrainState, make_optimizer
from video_layout_generation_tpu.train.vae_steps import (
    kl_anneal, make_convlstm_train_step, make_cvae_train_step,
    make_vae_train_step)

NCLS = 8


def _seg(n, h, w, seed=0):
    return np.random.default_rng(seed).integers(0, NCLS, (n, h, w)).astype(
        np.int32)


def test_kl_standard_normal_matches_torch():
    rng = np.random.default_rng(0)
    mu = rng.standard_normal((2, 4, 4, 3)).astype(np.float32)
    lv = rng.standard_normal((2, 4, 4, 3)).astype(np.float32)
    ours = float(kl_standard_normal(jnp.asarray(mu), jnp.asarray(lv)))
    mt, lt = torch.from_numpy(mu), torch.from_numpy(lv)
    ref = float((-0.5 * (1 + lt - mt ** 2 - lt.exp())).flatten(1).sum(1)
                .mean())
    assert abs(ours - ref) < 1e-5


def test_kl_gaussians_zero_for_identical():
    mu = jnp.ones((2, 4, 4, 3))
    lv = jnp.zeros((2, 4, 4, 3)) - 0.3
    assert abs(float(kl_gaussians(mu, lv, mu, lv))) < 1e-6


def test_vae_autoencode_learns():
    # config 1: single-frame layout autoencode at small scale
    model = LayoutVAE(n_classes=NCLS, latent_dim=8)
    seg = jnp.asarray(_seg(4, 16, 16))
    oh = jax.nn.one_hot(seg, NCLS)
    params = model.init(jax.random.key(0), oh, jax.random.key(1))
    state = TrainState.create(params, make_optimizer("adam", 1e-3, 0.9))
    step = make_vae_train_step(model, NCLS, donate=False)
    first = None
    for i in range(30):
        beta = kl_anneal(i, warmup_steps=20, beta_max=0.01)
        state, m = step(state, seg, jax.random.key(i), beta)
        if first is None:
            first = float(m["recon"])
    assert float(m["recon"]) < first, (first, float(m["recon"]))


def test_cvae_forward_and_rollout():
    model = LayoutCVAE(n_classes=NCLS, latent_dim=8)
    seg = _seg(2, 16, 16, seed=1)
    ctx = jnp.concatenate([jax.nn.one_hot(jnp.asarray(seg), NCLS)] * 2,
                          axis=-1)
    target = jax.nn.one_hot(jnp.asarray(seg), NCLS)
    params = model.init(jax.random.key(0), ctx, target, jax.random.key(1))
    logits, q, p = model.apply(params, ctx, target, jax.random.key(2))
    assert logits.shape == (2, 16, 16, NCLS)

    ro = make_cvae_rollout(model, n_frames=3, n_classes=NCLS)
    segs = ro(params, jnp.asarray(seg), jnp.asarray(seg), jax.random.key(3))
    assert segs.shape == (2, 3, 16, 16)
    assert int(segs.max()) < NCLS


def test_cvae_train_step():
    model = LayoutCVAE(n_classes=NCLS, latent_dim=8)
    ctx_ids = jnp.asarray(_seg(2, 16, 16, seed=2))[:, None].repeat(2, 1)
    target = jnp.asarray(_seg(2, 16, 16, seed=3))
    ctx = jnp.concatenate(
        [jax.nn.one_hot(ctx_ids[:, i], NCLS) for i in range(2)], axis=-1)
    params = model.init(jax.random.key(0), ctx,
                        jax.nn.one_hot(target, NCLS), jax.random.key(1))
    state = TrainState.create(params, make_optimizer())
    step = make_cvae_train_step(model, NCLS, donate=False)
    state, m = step(state, ctx_ids, target, jax.random.key(2), 0.5)
    assert np.isfinite(float(m["loss"]))
    assert float(m["kl"]) >= 0.0


def test_convlstm_predict_and_rollout():
    model = ConvLSTMLayoutPredictor(n_classes=NCLS, hidden=8, enc_width=4)
    ctx_ids = jnp.asarray(_seg(2, 16, 16, seed=4))[:, None].repeat(4, 1)
    ctx_oh = jax.nn.one_hot(ctx_ids, NCLS)
    params = model.init(jax.random.key(0), ctx_oh)
    logits = model.apply(params, ctx_oh)
    assert logits.shape == (2, 16, 16, NCLS)
    segs = model.apply(params, ctx_oh, 3, method=model.rollout)
    assert segs.shape == (2, 3, 16, 16)

    step = make_convlstm_train_step(model, NCLS, donate=False)
    state = TrainState.create(params, make_optimizer())
    target = jnp.asarray(_seg(2, 16, 16, seed=5))
    state, m = step(state, ctx_ids, target)
    assert np.isfinite(float(m["loss"]))

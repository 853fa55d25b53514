"""Adversarial training path (reference's flag-complete GAN capability,
src/trainer.py:219-246, SURVEY.md §7 step 7)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_layout_generation_tpu.config import Config
from video_layout_generation_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def gan_trainer(tmp_path_factory):
    cfg = Config(
        dataset="synthetic", synthetic_train_size=4, synthetic_val_size=4,
        image_size=(32, 32), batch_size=4, epochs=1, edge=False,
        filters_level=(4, 6, 8), compute_dtype="float32", workers=1,
        print_freq=1, path=str(tmp_path_factory.mktemp("gan_exp")),
        mesh_shape=(1,), gan_train=True, gan_mode="lsgan", ndf=8,
        rollout_frames=1,
    )
    return Trainer(cfg)


def test_gan_step_updates_both_nets(gan_trainer):
    t = gan_trainer
    g0 = jax.tree_util.tree_leaves(t.state.gen.params)
    d0 = jax.tree_util.tree_leaves(t.state.disc.params)
    t.set_epoch(0)
    t.train()
    g1 = jax.tree_util.tree_leaves(t.state.gen.params)
    d1 = jax.tree_util.tree_leaves(t.state.disc.params)
    assert any(not np.array_equal(a, b) for a, b in zip(g0, g1))
    assert any(not np.array_equal(a, b) for a, b in zip(d0, d1))


def test_gan_validate_and_checkpoint(gan_trainer):
    t = gan_trainer
    m = t.validate()
    assert np.isfinite(m["loss"])
    t.save_checkpoint()
    import os
    ckpt = os.path.join(t.cfg.path, "checkpoint", "001")
    t2 = Trainer(t.cfg.replace(resume=ckpt))
    for a, b in zip(jax.tree_util.tree_leaves(t.state.disc.params),
                    jax.tree_util.tree_leaves(t2.state.disc.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_wgangp_step_with_gradient_penalty(tmp_path):
    # the wgangp branch runs the double-grad (penalty) inside the fused step
    cfg = Config(
        dataset="synthetic", synthetic_train_size=4, synthetic_val_size=4,
        image_size=(32, 32), batch_size=4, epochs=1, edge=False,
        filters_level=(2, 3, 4), compute_dtype="float32", workers=1,
        path=str(tmp_path), mesh_shape=(1,), gan_train=True,
        gan_mode="wgangp", ndf=4, rollout_frames=1,
    )
    t = Trainer(cfg)
    t.set_epoch(0)
    t.train()
    assert t.global_step == 1
    # losses must be finite (a 16px input used to collapse the PatchGAN to
    # a zero-size output -> silent NaN; now raises at trace time)
    import jax.numpy as jnp
    from video_layout_generation_tpu.models import NLayerDiscriminator
    with pytest.raises(ValueError, match="needs input >= 24px"):
        d = NLayerDiscriminator(9, 4, n_layers=3, norm="instance")
        d.init(jax.random.key(0), jnp.zeros((1, 16, 16, 9)))


def test_gan_batchnorm_discriminator(tmp_path_factory):
    """BatchNorm D (torch pix2pix define_D default norm,
    src/models/networks.py:131): running stats thread through the fused
    step, both nets update, stats change, checkpoint carries them."""
    cfg = Config(
        dataset="synthetic", synthetic_train_size=4, synthetic_val_size=4,
        image_size=(32, 32), batch_size=4, epochs=1, edge=False,
        filters_level=(4, 6, 8), compute_dtype="float32", workers=1,
        print_freq=1, path=str(tmp_path_factory.mktemp("gan_bn")),
        mesh_shape=(1,), gan_train=True, gan_mode="lsgan", ndf=8,
        norm="batch", rollout_frames=1,
    )
    t = Trainer(cfg)
    assert t.state.disc_stats is not None
    s0 = jax.tree_util.tree_leaves(t.state.disc_stats)
    d0 = jax.tree_util.tree_leaves(t.state.disc.params)
    t.set_epoch(0)
    t.train()
    s1 = jax.tree_util.tree_leaves(t.state.disc_stats)
    d1 = jax.tree_util.tree_leaves(t.state.disc.params)
    assert any(not np.array_equal(a, b) for a, b in zip(s0, s1)), \
        "running stats did not update"
    assert any(not np.array_equal(a, b) for a, b in zip(d0, d1))
    for leaf in s1 + d1:
        assert np.all(np.isfinite(np.asarray(leaf)))
    # stats roundtrip through the checkpoint
    t.save_checkpoint()
    import os
    ckpt = os.path.join(cfg.path, "checkpoint", "001")
    t2 = Trainer(cfg.replace(resume=ckpt))
    for a, b in zip(s1, jax.tree_util.tree_leaves(t2.state.disc_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

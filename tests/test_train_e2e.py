"""End-to-end smoke: Trainer on the synthetic dataset (SURVEY.md §7 step 2).

Tiny shapes keep single-CPU compile times tolerable; the full loop still
exercises HNED edges, the 3-term loss, Adam updates, validation with IoU,
checkpoint save/restore, and the lax.scan rollout.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_layout_generation_tpu.config import Config
from video_layout_generation_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("exp"))
    return Config(
        dataset="synthetic", synthetic_train_size=8, synthetic_val_size=4,
        image_size=(32, 32), batch_size=4, epochs=1, edge=False,
        filters_level=(4, 6, 8), compute_dtype="float32",
        workers=2, print_freq=1, path=path, mesh_shape=(1,),
        rollout_frames=2,
    )


@pytest.fixture(scope="module")
def trainer(tiny_cfg):
    return Trainer(tiny_cfg)


def test_train_epoch_and_validate(trainer):
    trainer.set_epoch(0)
    trainer.train()
    metrics = trainer.validate()
    assert np.isfinite(metrics["loss"])
    assert 0.0 <= metrics["miou"] <= 1.0
    assert 0.0 <= metrics["pixel_acc"] <= 1.0
    assert metrics["per_class_iou"].shape == (20,)
    assert trainer.global_step == 2  # 8 samples / batch 4


def test_checkpoint_roundtrip(trainer, tiny_cfg):
    trainer.save_checkpoint()
    ckpt_path = os.path.join(tiny_cfg.path, "checkpoint", "001")
    assert os.path.isdir(ckpt_path)
    t2 = Trainer(tiny_cfg.replace(resume=ckpt_path))
    assert t2.epoch == trainer.epoch
    assert t2.global_step == trainer.global_step
    p1 = jax.tree_util.tree_leaves(trainer.state.params)
    p2 = jax.tree_util.tree_leaves(t2.state.params)
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_continues_at_saved_epoch(tiny_cfg, tmp_path_factory):
    """fit() after --resume runs only the REMAINING epochs (the reference
    restores start_epoch from the checkpoint, src/trainer.py resume path)."""
    path = str(tmp_path_factory.mktemp("resume"))
    cfg = tiny_cfg.replace(path=path, epochs=2)
    t = Trainer(cfg)
    t.fit()
    assert t.epoch == 2
    ckpts = sorted(os.listdir(os.path.join(path, "checkpoint")))
    assert "002" in ckpts

    # resume at epochs=3: exactly ONE more epoch must run
    t2 = Trainer(cfg.replace(epochs=3, resume="latest"))
    assert t2.epoch == 2
    steps_before = t2.global_step
    t2.fit()
    assert t2.epoch == 3
    assert t2.global_step == steps_before + 2  # 8 samples / batch 4

    # resume with epochs already satisfied ("latest" is now 003): no-op
    t3 = Trainer(cfg.replace(epochs=2, resume="latest"))
    assert t3.epoch == 3
    g3 = t3.global_step
    t3.fit()
    assert t3.epoch == 3 and t3.global_step == g3


def test_rollout_shapes(trainer):
    n, (h, w) = 2, trainer.cfg.image_size
    img = jnp.zeros((n, h, w, 3))
    seg = jnp.zeros((n, h, w, 1))
    imgs, segs = trainer.generate_sequence(img, img, seg, seg, save=False)
    assert imgs.shape == (n, 2, h, w, 3)
    assert segs.shape == (n, 2, h, w, 1)
    # fed-back segs are integral class ids in float
    s = np.asarray(segs)
    np.testing.assert_array_equal(s, np.round(s))
    assert s.min() >= 0 and s.max() < 20


def test_rollout_fidelity_eval(trainer):
    from video_layout_generation_tpu.evaluation.sequence import (
        evaluate_trainer_rollout)
    from video_layout_generation_tpu.data.synthetic import SyntheticTriplets

    ds = SyntheticTriplets(4, trainer.cfg.image_size,
                           trainer.cfg.n_classes, seed=99)
    out = evaluate_trainer_rollout(trainer, ds, [0, 1], n_frames=2)
    assert out["per_step_miou"].shape == (2,)
    assert 0.0 <= out["mean_miou"] <= 1.0
    assert 0.0 <= out["mean_pixel_acc"] <= 1.0


def test_lr_policy_reachable_from_trainer(tiny_cfg, tmp_path_factory):
    """pix2pix scheduler policies drive the flagship Trainer's lr
    (reference get_scheduler, src/models/networks.py:38-64)."""
    from video_layout_generation_tpu.train.state import current_lr

    cfg = tiny_cfg.replace(path=str(tmp_path_factory.mktemp("sched")),
                           lr_policy="linear", niter=1, niter_decay=4,
                           lr=1e-3)
    t = Trainer(cfg)
    lrs = []
    for epoch in range(3):
        t.set_epoch(epoch)
        lrs.append(current_lr(t.state))
    assert lrs[0] == pytest.approx(1e-3)
    # linear decay after niter epochs: scale 1 - (e + 1 - 1)/5
    assert lrs[1] == pytest.approx(1e-3 * (1 - 1 / 5))
    assert lrs[2] == pytest.approx(1e-3 * (1 - 2 / 5))

    cfg2 = cfg.replace(lr_policy="step", lr_decay_iters=2,
                       path=str(tmp_path_factory.mktemp("sched2")))
    t2 = Trainer(cfg2)
    t2.set_epoch(0)
    assert current_lr(t2.state) == pytest.approx(1e-3)
    t2.set_epoch(2)
    assert current_lr(t2.state) == pytest.approx(1e-4)

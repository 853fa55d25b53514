"""Trainer-level multi-device coverage (VERDICT r1 #5): the FULL Trainer —
loaders, sharded train step, validation with confusion totals, checkpoint
save/resume — driven across the virtual 8-device mesh, with the production
input contract (HNED edges on, 10 channels), and compared against the
single-device Trainer for step-for-step parity.
"""

import os

import jax
import numpy as np
import pytest

from video_layout_generation_tpu.config import Config
from video_layout_generation_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def mesh_cfg(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("exp8"))
    return Config(
        dataset="synthetic", synthetic_train_size=16, synthetic_val_size=8,
        image_size=(32, 32), batch_size=8, epochs=1, edge=True,
        filters_level=(4, 6, 8), compute_dtype="float32",
        workers=2, print_freq=1, path=path, mesh_shape=(8,),
        rollout_frames=2, fast_train=False, fast_rollout=False,
    )


@pytest.fixture(scope="module")
def trainer8(mesh_cfg):
    assert len(jax.devices()) >= 8, "conftest must fake 8 CPU devices"
    return Trainer(mesh_cfg)


def test_mesh8_train_validate(trainer8):
    trainer8.set_epoch(0)
    trainer8.train()
    metrics = trainer8.validate()
    assert np.isfinite(metrics["loss"])
    assert 0.0 <= metrics["miou"] <= 1.0
    assert 0.0 <= metrics["pixel_acc"] <= 1.0
    assert trainer8.global_step == 2  # 16 samples / global batch 8


def test_mesh8_checkpoint_roundtrip(trainer8, mesh_cfg):
    trainer8.save_checkpoint()
    ckpt_path = os.path.join(mesh_cfg.path, "checkpoint", "001")
    assert os.path.isdir(ckpt_path)
    t2 = Trainer(mesh_cfg.replace(resume=ckpt_path))
    assert t2.epoch == trainer8.epoch
    for a, b in zip(jax.tree_util.tree_leaves(trainer8.state.params),
                    jax.tree_util.tree_leaves(t2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mesh8_matches_single_device_trainer(mesh_cfg, tmp_path_factory):
    """One epoch on the 8-device mesh must produce the same params and
    validation metrics as the identical run on a 1-device mesh (the
    Trainer-level extension of the step-level DP parity test)."""
    cfg8 = mesh_cfg.replace(path=str(tmp_path_factory.mktemp("dp8")))
    cfg1 = cfg8.replace(mesh_shape=(1,),
                        path=str(tmp_path_factory.mktemp("dp1")))
    t8, t1 = Trainer(cfg8), Trainer(cfg1)
    for t in (t8, t1):
        t.set_epoch(0)
        t.train()
    m8, m1 = t8.validate(), t1.validate()
    assert abs(m8["loss"] - m1["loss"]) < 1e-3 * max(1.0, abs(m1["loss"]))
    assert abs(m8["miou"] - m1["miou"]) < 1e-4
    for a, b in zip(jax.tree_util.tree_leaves(t8.state.params),
                    jax.tree_util.tree_leaves(t1.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-4)

"""Epoch-as-scan executor (train/epoch_scan.py): the scanned epoch must
walk the same parameter trajectory as the per-step dispatch loop."""

import numpy as np

import jax
import jax.numpy as jnp

from video_layout_generation_tpu.data.device_synthetic import (
    DeviceSyntheticLoader, make_device_renderer)
from video_layout_generation_tpu.data.synthetic import SyntheticTriplets
from video_layout_generation_tpu.losses.combined import CombinedLoss
from video_layout_generation_tpu.models import GridNet
from video_layout_generation_tpu.train.epoch_scan import make_epoch_scan
from video_layout_generation_tpu.train.state import TrainState, make_optimizer
from video_layout_generation_tpu.train.steps import make_train_step

_HW = (32, 32)


def test_epoch_scan_matches_step_loop():
    ds = SyntheticTriplets(8, _HW, seed=6)
    render = make_device_renderer(ds.scene_table(), ds.hw, ds.n_classes,
                                  ds.stride)
    model = GridNet(n_channels=8, filters_level=(4, 6, 8))
    combined = CombinedLoss.create(image_hw=_HW)
    params = model.init(jax.random.key(0), jnp.zeros((1, *_HW, 8)))
    tx = make_optimizer("adam", 2e-4, 0.5)
    base_key = jax.random.key(42)

    raw = make_train_step(model.apply, None, combined, jit=False)
    stepped = make_train_step(model.apply, None, combined, donate=False)
    idx_all = np.arange(8, dtype=np.int32).reshape(2, 4)

    # per-step dispatch loop, 2 epochs
    s_loop = TrainState.create(params, tx)
    losses_loop = []
    gstep = 0
    for _ in range(2):
        for row in idx_all:
            gstep += 1
            rng = jax.random.fold_in(base_key, gstep)
            s_loop, m = stepped(s_loop, None, render(jnp.asarray(row)), rng)
            losses_loop.append(float(m["loss"]))

    # one scan per epoch
    epoch_fn = make_epoch_scan(render, raw, donate=False)
    s_scan = TrainState.create(params, tx)
    losses_scan = []
    for e in range(2):
        s_scan, losses = epoch_fn(s_scan, None, jnp.asarray(idx_all),
                                  base_key, jnp.int32(e * 2))
        losses_scan.extend(np.asarray(losses).tolist())

    np.testing.assert_allclose(losses_loop, losses_scan, rtol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s_loop.params),
                    jax.tree_util.tree_leaves(s_scan.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_trainer_epoch_scan_e2e(tmp_path):
    from video_layout_generation_tpu.config import Config
    from video_layout_generation_tpu.train import Trainer
    cfg = Config(dataset="synthetic", synthetic_train_size=8,
                 synthetic_val_size=4, image_size=_HW, batch_size=4,
                 epochs=2, edge=False, arch="GridNet", device_data=True,
                 epoch_scan=True, filters_level=(4, 6, 8),
                 compute_dtype="float32", workers=2, mesh_shape=(1,),
                 path=str(tmp_path), rollout_frames=2)
    t = Trainer(cfg)
    m = t.fit()
    assert np.isfinite(m["loss"])
    assert t.global_step == 4  # 2 epochs x 2 scanned steps


def test_loader_epoch_indices_match_iteration():
    ds = SyntheticTriplets(16, _HW, seed=2)
    ld = DeviceSyntheticLoader(ds, 4, seed=3)
    ld.set_epoch(2)
    idx = ld.epoch_indices()
    render = ld._render
    for row, batch in zip(idx, ld):
        ref = render(jnp.asarray(row))
        np.testing.assert_array_equal(np.asarray(ref["seg3"]),
                                      np.asarray(batch["seg3"]))

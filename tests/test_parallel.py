"""Data-parallel correctness (SURVEY.md §4, §7 step 5): the sharded step
must equal the single-device step, and the sharded loader must cover the
dataset deterministically."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_layout_generation_tpu.losses.combined import CombinedLoss
from video_layout_generation_tpu.models import GridNet
from video_layout_generation_tpu.parallel.mesh import (batch_sharding,
                                                       make_mesh,
                                                       shard_batch)
from video_layout_generation_tpu.train.state import TrainState, make_optimizer
from video_layout_generation_tpu.train.steps import make_train_step


def _batch(n, h=16, w=16, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "img1": rng.random((n, h, w, 3), np.float32),
        "img2": rng.random((n, h, w, 3), np.float32),
        "img3": rng.random((n, h, w, 3), np.float32),
        "seg1": rng.integers(0, 20, (n, h, w, 1)).astype(np.float32),
        "seg2": rng.integers(0, 20, (n, h, w, 1)).astype(np.float32),
        "seg3": rng.integers(0, 20, (n, h, w)).astype(np.int32),
    }


def test_dp_step_matches_single_device():
    devices = jax.devices()
    assert len(devices) >= 8, "conftest must fake 8 CPU devices"
    model = GridNet(n_channels=8, filters_level=(4, 6, 8))
    combined = CombinedLoss.create(image_hw=(16, 16))
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, 16, 16, 8)))
    step = make_train_step(model.apply, None, combined, donate=False)
    host = _batch(8)
    rng = jax.random.key(7)

    # single device
    tx = make_optimizer("adam", 2e-4, 0.5)
    s1 = TrainState.create(params, tx)
    s1, m1 = step(s1, None, jax.tree_util.tree_map(jnp.asarray, host), rng)

    # 8-device data-parallel
    mesh = make_mesh(devices=devices[:8])
    with jax.set_mesh(mesh):
        s8 = TrainState.create(params, tx)
        sharded = shard_batch(host, mesh)
        s8, m8 = step(s8, None, sharded, rng)

    assert abs(float(m1["loss"]) - float(m8["loss"])) < 1e-3
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-4)


def test_host_loader_epoch_determinism_and_sharding():
    from video_layout_generation_tpu.data.pipeline import HostLoader
    from video_layout_generation_tpu.data.synthetic import SyntheticTriplets

    ds = SyntheticTriplets(16, (8, 8), 20)
    # same epoch -> identical batches; different epoch -> different order
    l1 = HostLoader(ds, 4, seed=3, workers=2)
    l1.set_epoch(0)
    a = [b["seg3"] for b in l1]
    l1.set_epoch(0)
    b = [b_["seg3"] for b_ in l1]
    l1.set_epoch(1)
    c = [b_["seg3"] for b_ in l1]
    assert len(a) == 4
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    assert any(not np.array_equal(x, y) for x, y in zip(a, c))

    # two processes partition the (padded) index space
    p0 = HostLoader(ds, 4, seed=3, workers=1, process_index=0,
                    process_count=2)
    p1 = HostLoader(ds, 4, seed=3, workers=1, process_index=1,
                    process_count=2)
    p0.set_epoch(0)
    p1.set_epoch(0)
    n0 = sum(b["seg3"].shape[0] for b in p0)
    n1 = sum(b["seg3"].shape[0] for b in p1)
    assert n0 == n1 == 8


def test_validation_aggregation_matches_single_process():
    """Multi-host validation correctness (reference all_reduce semantics,
    src/trainer.py:336-340): the size-weighted loss and confusion-matrix
    totals accumulated from two process-sharded loaders (whose per-batch
    concatenation is exactly what make_array_from_process_local_data
    assembles on a real multi-host mesh) must equal the single-process
    run over the same dataset."""
    from video_layout_generation_tpu.data.pipeline import HostLoader
    from video_layout_generation_tpu.data.synthetic import SyntheticTriplets
    from video_layout_generation_tpu.train.steps import make_eval_step

    ds = SyntheticTriplets(16, (16, 16), 20)
    model = GridNet(n_channels=8, filters_level=(4, 6, 8))
    combined = CombinedLoss.create(image_hw=(16, 16))
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, 16, 16, 8)))
    eval_step = make_eval_step(model.apply, None, combined.eval_variant(),
                               n_classes=20)

    def run(loaders):
        loss_sum, n, cm_total = 0.0, 0, np.zeros((20, 20))
        for parts in zip(*[iter(l) for l in loaders]):
            batch = {k: np.concatenate([p[k] for p in parts])
                     for k in parts[0]}
            m, _, _ = eval_step(params, None, batch)
            bs = batch["img1"].shape[0]
            loss_sum += float(m["loss"]) * bs
            n += bs
            cm_total = cm_total + np.asarray(m["cm"])
        return loss_sum / n, cm_total

    single = [HostLoader(ds, 8, shuffle=False, workers=1)]
    multi = [HostLoader(ds, 4, shuffle=False, workers=1,
                        process_index=i, process_count=2) for i in (0, 1)]
    l1, c1 = run(single)
    l2, c2 = run(multi)
    assert abs(l1 - l2) < 1e-4 * max(1.0, abs(l1))
    np.testing.assert_allclose(c1, c2, rtol=1e-6)


def test_layout_validation_cm_matches_single_process():
    """Same invariance for the LayoutTrainer families' validation path
    (prediction + confusion accumulation over process-sharded loaders)."""
    from video_layout_generation_tpu.data.pipeline import HostLoader
    from video_layout_generation_tpu.data.synthetic import SyntheticTriplets
    from video_layout_generation_tpu.evaluation.metrics import (
        confusion_matrix)
    from video_layout_generation_tpu.models.convlstm import (
        ConvLSTMLayoutPredictor)

    ds = SyntheticTriplets(8, (16, 16), 20)
    model = ConvLSTMLayoutPredictor(20, 8)
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, 2, 16, 16, 20)))

    @jax.jit
    def predict(p, batch):
        ctx = jnp.stack([batch["seg1"][..., 0], batch["seg2"][..., 0]],
                        axis=1).astype(jnp.int32)
        return jnp.argmax(model.apply(p, jax.nn.one_hot(ctx, 20)), axis=-1)

    def run(loaders):
        cm_total = np.zeros((20, 20))
        for parts in zip(*[iter(l) for l in loaders]):
            batch = {k: np.concatenate([p[k] for p in parts])
                     for k in parts[0]}
            pred = predict(params, batch)
            cm = confusion_matrix(pred, batch["seg3"].astype(jnp.int32), 20)
            cm_total = cm_total + np.asarray(cm)
        return cm_total

    single = [HostLoader(ds, 4, shuffle=False, workers=1)]
    multi = [HostLoader(ds, 2, shuffle=False, workers=1,
                        process_index=i, process_count=2) for i in (0, 1)]
    np.testing.assert_allclose(run(single), run(multi), rtol=1e-6)

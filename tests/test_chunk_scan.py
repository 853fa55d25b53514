"""Chunked K-step dispatch (train/chunk_scan.py): uploading K host batches
as one stacked array and scanning K steps inside one compiled program must
walk the SAME parameter trajectory as the per-step dispatch loop (identical
fold_in RNG stream), for both the executor in isolation and the Trainer
end to end (including a tail shorter than K)."""

import jax
import jax.numpy as jnp
import numpy as np

from video_layout_generation_tpu.config import Config
from video_layout_generation_tpu.data.pipeline import HostLoader
from video_layout_generation_tpu.data.synthetic import SyntheticTriplets
from video_layout_generation_tpu.losses.combined import CombinedLoss
from video_layout_generation_tpu.models import GridNet
from video_layout_generation_tpu.parallel.mesh import make_mesh, shard_batch
from video_layout_generation_tpu.train.chunk_scan import (
    iter_chunks, make_chunk_scan, put_chunk, stack_batches)
from video_layout_generation_tpu.train.state import TrainState, make_optimizer
from video_layout_generation_tpu.train.steps import make_train_step
from video_layout_generation_tpu.train.trainer import Trainer

_HW = (32, 32)


def test_chunk_scan_matches_step_loop():
    ds = SyntheticTriplets(8, _HW, seed=6)
    loader = HostLoader(ds, 4, shuffle=False, workers=1,
                        transfer_uint8=True)
    batches = list(loader)  # packed6 uint8 batches
    assert set(batches[0]) == {"packed6"}

    model = GridNet(n_channels=8, filters_level=(4, 6, 8))
    combined = CombinedLoss.create(image_hw=_HW)
    params = model.init(jax.random.key(0), jnp.zeros((1, *_HW, 8)))
    tx = make_optimizer("adam", 2e-4, 0.5)
    base_key = jax.random.key(42)
    mesh = make_mesh(jax.devices()[:2])  # batch 4 shards over 2 devices

    # per-step dispatch, 2 epochs over the same 2 batches
    stepped = make_train_step(model.apply, None, combined, donate=False)
    s_loop = TrainState.create(params, tx)
    losses_loop, gstep = [], 0
    for _ in range(2):
        for b in batches:
            gstep += 1
            rng = jax.random.fold_in(base_key, gstep)
            s_loop, m = stepped(s_loop, None, shard_batch(b, mesh), rng)
            losses_loop.append(float(m["loss"]))

    # chunked: one (2, B, H, W, 12) upload + one scan per epoch
    raw = make_train_step(model.apply, None, combined, jit=False)
    chunk_fn = make_chunk_scan(raw, donate=False)
    s_chunk = TrainState.create(params, tx)
    losses_chunk = []
    for e in range(2):
        dev = put_chunk(stack_batches(batches), mesh)
        s_chunk, losses = chunk_fn(s_chunk, None, dev, base_key,
                                   jnp.int32(e * 2))
        losses_chunk.extend(np.asarray(losses).tolist())

    np.testing.assert_allclose(losses_loop, losses_chunk, rtol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s_loop.params),
                    jax.tree_util.tree_leaves(s_chunk.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_iter_chunks_tail():
    chunks = list(iter_chunks(iter([1, 2, 3, 4, 5]), 2))
    assert chunks == [[1, 2], [3, 4], [5]]


def _mk_cfg(path, chunk_steps):
    return Config(
        dataset="synthetic", synthetic_train_size=12, synthetic_val_size=4,
        image_size=(32, 32), batch_size=4, epochs=1, edge=False,
        filters_level=(4, 6, 8), compute_dtype="float32", workers=1,
        path=path, mesh_shape=(1,), rollout_frames=2,
        chunk_steps=chunk_steps)


def test_trainer_chunked_matches_per_step(tmp_path):
    # 3 batches/epoch with K=2: one full chunk + a 1-batch tail through the
    # per-step path — both executors in one epoch
    t_ref = Trainer(_mk_cfg(str(tmp_path / "ref"), 0))
    t_ref.set_epoch(0)
    t_ref.train()

    t_chk = Trainer(_mk_cfg(str(tmp_path / "chk"), 2))
    t_chk.set_epoch(0)
    t_chk.train()

    assert t_chk.global_step == t_ref.global_step == 3
    for a, b in zip(jax.tree_util.tree_leaves(t_ref.state.params),
                    jax.tree_util.tree_leaves(t_chk.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)

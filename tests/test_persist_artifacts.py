"""Artifact persistence round-trip — tools/persist_artifacts.py.

The campaign prerequisites (flagship base checkpoint, pretrained loss
nets) are wiped between rounds; the persist tool snapshots them into the
committed artifacts_store/. Contract: pack -> unpack reproduces every
parameter leaf BIT-EXACTLY and the unpacked checkpoint feeds the
weights-only warm-start path (restore_path + merge_params)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_layout_generation_tpu.io.checkpoint import (CheckpointManager,
                                                       merge_params)

from tools.persist_artifacts import main as persist_main


@pytest.fixture
def small_ckpt(tmp_path):
    params = {"enc": {"conv": {"kernel": np.arange(36, dtype=np.float32)
                               .reshape(3, 3, 2, 2) / 7.0,
                               "bias": np.zeros(2, np.float32)}},
              "head": {"w": np.linspace(-1, 1, 8).astype(jnp.bfloat16)}}
    mgr = CheckpointManager(str(tmp_path / "checkpoint"))
    mgr.save(epoch=96, params=params, opt_state=0, step=1234,
             arch="GridNet")
    return str(tmp_path / "checkpoint" / "096"), params


def test_pack_unpack_checkpoint_bit_exact(small_ckpt, tmp_path):
    src, params = small_ckpt
    snap = str(tmp_path / "snap.npz")
    dst = str(tmp_path / "restored")
    persist_main(["pack", "--ckpt", src, "--out", snap])
    persist_main(["unpack", "--snap", snap, "--ckpt", dst])

    tree = CheckpointManager.restore_path(dst)
    assert tree["epoch"] == 96 and tree["arch"] == "GridNet"
    assert tree["step"] == 1234
    la = jax.tree_util.tree_leaves(params)
    lb = jax.tree_util.tree_leaves(tree["params"])
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        assert np.asarray(a).dtype == np.asarray(b).dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # feeds the warm-start path: full intersection, nothing dropped
    merged, rep = merge_params(params, tree["params"])
    assert rep["missing"] == [] and rep["unexpected"] == []
    assert rep["shape_mismatch"] == []


def test_full_resume_from_snapshot_fails_loudly(small_ckpt, tmp_path):
    """Snapshots are weights-only: a full --resume against a restored dir
    must fail early with a self-describing error (ADVICE r4), and the
    'latest' alias written by unpack must resolve to the epoch dir."""
    src, _ = small_ckpt
    snap = str(tmp_path / "snap.npz")
    dst = str(tmp_path / "restored" / "checkpoint" / "096")
    persist_main(["pack", "--ckpt", src, "--out", snap])
    persist_main(["unpack", "--snap", snap, "--ckpt", dst])

    mgr = CheckpointManager(str(tmp_path / "restored" / "checkpoint"))
    with pytest.raises(ValueError, match="weights-only"):
        mgr.restore("latest")
    with pytest.raises(ValueError, match="weights-only"):
        mgr.restore(96)
    # the weights-only warm-start path stays usable
    assert mgr.restore_weights(96)["head"]["w"].shape == (8,)


def test_pack_unpack_plain_npz(tmp_path):
    src = str(tmp_path / "net.npz")
    np.savez(src, w1=np.ones((4, 4), np.float32),
             scale=np.float32(2.5))
    snap = str(tmp_path / "store.npz")
    dst = str(tmp_path / "restored.npz")
    persist_main(["pack", "--npz", src, "--out", snap])
    persist_main(["unpack", "--snap", snap, "--npz", dst])
    a, b = np.load(src), np.load(dst)
    assert set(a.files) == set(b.files)
    for k in a.files:
        np.testing.assert_array_equal(a[k], b[k])

"""Key-gated partial warm start (reference --ckpt semantics,
src/trainer.py:65-76): loading a checkpoint into a DIFFERENT architecture
takes the key/shape intersection and keeps live init elsewhere, instead of
crashing on a wholesale replace. Verified GridNet -> CoordGridNet (coord
blocks change shapes) and a changed-head variant, both of which must load
the overlap and then train.
"""

import numpy as np
import pytest

from video_layout_generation_tpu.config import Config
from video_layout_generation_tpu.io.checkpoint import merge_params
from video_layout_generation_tpu.train.trainer import Trainer


def _flat(params):
    out = {}

    def walk(t, p=()):
        if isinstance(t, dict):
            for k, v in t.items():
                walk(v, p + (k,))
        else:
            out["/".join(p)] = np.asarray(t)
    walk(params)
    return out


def test_merge_params_intersection():
    live = {"a": {"w": np.zeros((2, 3)), "b": np.zeros((3,))},
            "new": {"w": np.ones((4,))}}
    restored = {"a": {"w": np.full((2, 3), 7.0), "b": np.zeros((9,))},
                "gone": {"w": np.ones((1,))}}
    merged, rep = merge_params(live, restored)
    np.testing.assert_array_equal(merged["a"]["w"], 7.0)  # loaded
    assert merged["a"]["b"].shape == (3,)                 # shape mismatch kept
    np.testing.assert_array_equal(merged["new"]["w"], 1.0)  # missing kept
    assert rep["loaded"] == ["a/w"]
    assert rep["missing"] == ["new/w"]
    assert rep["unexpected"] == ["gone/w"]
    assert len(rep["shape_mismatch"]) == 1 and "a/b" in rep["shape_mismatch"][0]


@pytest.fixture(scope="module")
def gridnet_ckpt(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("src_exp"))
    cfg = Config(
        dataset="synthetic", synthetic_train_size=4, synthetic_val_size=4,
        image_size=(32, 32), batch_size=4, epochs=1, edge=False,
        arch="GridNet", filters_level=(4, 6, 8), compute_dtype="float32",
        workers=1, path=path, mesh_shape=(1,), rollout_frames=2)
    t = Trainer(cfg)
    t.set_epoch(0)
    t.train()
    t.save_checkpoint()
    import os
    return os.path.join(path, "checkpoint", "001"), t.state.params


def test_cross_arch_warm_start_gridnet_to_coord(gridnet_ckpt,
                                                tmp_path_factory):
    ckpt_path, src_params = gridnet_ckpt
    cfg = Config(
        dataset="synthetic", synthetic_train_size=4, synthetic_val_size=4,
        image_size=(32, 32), batch_size=4, epochs=1, edge=False,
        arch="CoordGridNet", filters_level=(4, 6, 8),
        compute_dtype="float32", workers=1,
        path=str(tmp_path_factory.mktemp("dst_exp")), mesh_shape=(1,),
        rollout_frames=2, ckpt=ckpt_path)
    t = Trainer(cfg)  # must NOT crash despite coord-induced shape changes
    flat_src, flat_dst = _flat(src_params), _flat(t.state.params)
    loaded = [k for k in flat_dst
              if k in flat_src and flat_src[k].shape == flat_dst[k].shape]
    assert loaded, "no overlap loaded"
    for k in loaded:
        np.testing.assert_array_equal(flat_dst[k], flat_src[k])
    # coord variants change input-channel counts somewhere: assert at least
    # one shape-mismatched or missing leaf kept its fresh init
    assert any(k not in flat_src or flat_src[k].shape != flat_dst[k].shape
               for k in flat_dst)
    # and it still trains
    t.set_epoch(0)
    t.train()
    assert t.global_step == 1


def test_changed_head_warm_start(gridnet_ckpt, tmp_path_factory):
    """Same arch, different head width (n_channels 8 -> 10 adds edge
    channels): head tensors mismatch, trunk loads."""
    ckpt_path, src_params = gridnet_ckpt
    cfg = Config(
        dataset="synthetic", synthetic_train_size=4, synthetic_val_size=4,
        image_size=(32, 32), batch_size=4, epochs=1, edge=True,
        arch="GridNet", filters_level=(4, 6, 8), compute_dtype="float32",
        workers=1, path=str(tmp_path_factory.mktemp("dst2_exp")),
        mesh_shape=(1,), rollout_frames=2, ckpt=ckpt_path)
    t = Trainer(cfg)
    flat_src, flat_dst = _flat(src_params), _flat(t.state.params)
    matched = [k for k in flat_dst
               if k in flat_src and flat_src[k].shape == flat_dst[k].shape]
    mismatched = [k for k in flat_dst
                  if k in flat_src and flat_src[k].shape != flat_dst[k].shape]
    assert matched and mismatched  # partial load actually happened
    for k in matched:
        np.testing.assert_array_equal(flat_dst[k], flat_src[k])


def test_disjoint_ckpt_raises(tmp_path_factory):
    import orbax.checkpoint as ocp
    path = str(tmp_path_factory.mktemp("fake") / "000")
    ocp.PyTreeCheckpointer().save(
        path, {"params": {"alien": {"kernel": np.zeros((1, 1))}},
               "opt_state": {}, "epoch": 0, "step": 0, "arch": "Other"})
    cfg = Config(
        dataset="synthetic", synthetic_train_size=4, synthetic_val_size=4,
        image_size=(32, 32), batch_size=4, epochs=1, edge=False,
        arch="GridNet", filters_level=(4, 6, 8), compute_dtype="float32",
        workers=1, path=str(tmp_path_factory.mktemp("dst3_exp")),
        mesh_shape=(1,), rollout_frames=2, ckpt=path)
    # zero loadable keys -> loud error, not a silent fresh init
    with pytest.raises(ValueError, match="shares no parameters"):
        Trainer(cfg)

"""On-device synthetic rendering (data/device_synthetic.py): the device
renderer must reproduce the host dataset from the shared scene table, and
the loader must drop into the Trainer."""

import numpy as np

import jax
import jax.numpy as jnp

from video_layout_generation_tpu.data.device_synthetic import (
    DeviceSyntheticLoader, make_device_renderer)
from video_layout_generation_tpu.data.synthetic import SyntheticTriplets

_HW = (32, 32)


def _host_float(ds, i):
    """Uncached float sample (bypasses the uint8 sample cache)."""
    raw = SyntheticTriplets(ds.size, ds.hw, ds.n_classes, seed=ds.seed,
                            cache=False, n_frames=ds.n_frames)
    return raw[i]


def test_render_matches_host_dataset():
    ds = SyntheticTriplets(12, _HW, seed=5)
    render = make_device_renderer(ds.scene_table(), ds.hw, ds.n_classes,
                                  ds.stride, n_frames=3)
    batch = render(jnp.arange(12, dtype=jnp.int32))
    seg_mismatch = 0
    img_err = 0.0
    total = 0
    for i in range(12):
        host = _host_float(ds, i)
        for k, (ik, sk) in enumerate((("img1", "seg1"), ("img2", "seg2"),
                                      ("img3", "seg3"))):
            seg_d = np.asarray(batch[sk][i])
            if seg_d.ndim == 3:
                seg_d = seg_d[..., 0].astype(np.int32)
            seg_h = host[sk]
            if seg_h.ndim == 3:
                seg_h = seg_h[..., 0].astype(np.int32)
            seg_mismatch += int(np.sum(seg_d != seg_h))
            img_err = max(img_err, float(np.max(np.abs(
                np.asarray(batch[ik][i]) - host[ik]))))
            total += seg_h.size
    # host computes rectangle edges in f64, device in f32 — a boundary can
    # shift by one pixel in rare cases
    assert seg_mismatch / total < 1e-4, (seg_mismatch, total)
    assert img_err < 2e-2, img_err  # edge-pixel color flips bound this


def test_render_window_contract_matches_host():
    ds = SyntheticTriplets(6, _HW, seed=11, n_frames=5)
    render = make_device_renderer(ds.scene_table(), ds.hw, ds.n_classes,
                                  ds.stride, n_frames=5)
    batch = render(jnp.arange(6, dtype=jnp.int32))
    assert batch["imgs"].shape == (6, 5, *_HW, 3)
    assert batch["segs"].shape == (6, 5, *_HW)
    host = _host_float(ds, 3)
    mism = np.mean(np.asarray(batch["segs"][3]) != host["segs"])
    assert mism < 1e-4, mism


def test_loader_determinism_and_coverage():
    ds = SyntheticTriplets(16, _HW, seed=2)
    ld = DeviceSyntheticLoader(ds, 4, seed=3)
    ld.set_epoch(0)
    a = [np.asarray(b["seg3"]) for b in ld]
    ld.set_epoch(0)
    b = [np.asarray(x["seg3"]) for x in ld]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    assert len(a) == 4
    ld.set_epoch(1)
    c = [np.asarray(x["seg3"]) for x in ld]
    assert any(not np.array_equal(x, y) for x, y in zip(a, c))


def test_trainer_device_data_e2e(tmp_path):
    from video_layout_generation_tpu.config import Config
    from video_layout_generation_tpu.train import Trainer
    cfg = Config(dataset="synthetic", synthetic_train_size=8,
                 synthetic_val_size=4, image_size=_HW, batch_size=4,
                 epochs=1, edge=False, arch="GridNet", device_data=True,
                 filters_level=(4, 6, 8), compute_dtype="float32",
                 workers=2, mesh_shape=(1,), path=str(tmp_path),
                 rollout_frames=2)
    t = Trainer(cfg)
    m = t.fit()
    assert np.isfinite(m["loss"])


def test_loader_sharded_render_matches_unsharded():
    from video_layout_generation_tpu.parallel.mesh import make_mesh
    devices = jax.devices()
    assert len(devices) >= 8
    ds = SyntheticTriplets(16, _HW, seed=9)
    plain = DeviceSyntheticLoader(ds, 8, seed=4)
    mesh = DeviceSyntheticLoader(ds, 8, mesh=make_mesh(devices=devices[:8]),
                                 seed=4)
    plain.set_epoch(0)
    mesh.set_epoch(0)
    for bp, bm in zip(plain, mesh):
        for k in bp:
            np.testing.assert_array_equal(np.asarray(bp[k]),
                                          np.asarray(bm[k]))


def test_trainer_device_data_multistep_e2e(tmp_path):
    """Device-rendered window batches through the K-step objective — the
    zero-H2D leg executor (renderer n_frames = K+2; decode_window_batch
    consumes the float window contract directly)."""
    from video_layout_generation_tpu.config import Config
    from video_layout_generation_tpu.train import Trainer
    cfg = Config(dataset="synthetic", synthetic_train_size=8,
                 synthetic_val_size=4, image_size=_HW, batch_size=4,
                 epochs=1, edge=False, arch="GridNet", device_data=True,
                 multistep_k=2, filters_level=(4, 6, 8),
                 compute_dtype="float32", workers=2, mesh_shape=(1,),
                 path=str(tmp_path), rollout_frames=2)
    t = Trainer(cfg)
    m = t.fit()
    assert np.isfinite(m["loss"])

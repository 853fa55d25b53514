"""Serving predictor: checkpoint load -> padded batched rollout."""

import numpy as np
import pytest

from video_layout_generation_tpu.config import Config
from video_layout_generation_tpu.serving import LayoutPredictor
from video_layout_generation_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def ckpt_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("serve_exp"))
    cfg = Config(dataset="synthetic", synthetic_train_size=4,
                 synthetic_val_size=4, image_size=(32, 32), batch_size=4,
                 epochs=1, edge=False, arch="GridNet",
                 filters_level=(4, 6, 8), compute_dtype="float32",
                 workers=1, path=path, mesh_shape=(1,), rollout_frames=2)
    t = Trainer(cfg)
    t.epoch = 1
    t.save_checkpoint()
    import os
    return os.path.join(path, "checkpoint", "001")


def test_predict_pads_and_returns_ranges(ckpt_path):
    pred = LayoutPredictor.from_checkpoint(
        ckpt_path, arch="GridNet", n_frames=2, batch=4,
        image_hw=(32, 32), filters_level=(4, 6, 8), use_bf16=False)
    rng = np.random.default_rng(0)
    img = rng.random((3, 32, 32, 3)).astype(np.float32)   # n=3 < batch=4
    seg = rng.integers(0, 20, (3, 32, 32))
    frames, layouts = pred.predict(img, img, seg, seg)
    assert frames.shape == (3, 2, 32, 32, 3)
    assert layouts.shape == (3, 2, 32, 32)
    assert frames.min() >= 0.0 and frames.max() <= 1.0
    assert layouts.dtype == np.int32 and layouts.max() < 20


def test_predict_rejects_oversized_batch(ckpt_path):
    pred = LayoutPredictor.from_checkpoint(
        ckpt_path, arch="GridNet", n_frames=1, batch=2,
        image_hw=(32, 32), filters_level=(4, 6, 8), use_bf16=False)
    img = np.zeros((3, 32, 32, 3), np.float32)
    seg = np.zeros((3, 32, 32), np.int32)
    with pytest.raises(ValueError, match="shard the request"):
        pred.predict(img, img, seg, seg)


def test_predict_edge_mode(ckpt_path, tmp_path):
    # edge-mode serving: HNED runs inside the scan (10ch contract)
    import jax
    import jax.numpy as jnp
    from video_layout_generation_tpu.config import Config
    from video_layout_generation_tpu.models import HNED

    # a 10ch checkpoint
    cfg = Config(dataset="synthetic", synthetic_train_size=4,
                 synthetic_val_size=4, image_size=(32, 32), batch_size=4,
                 epochs=1, edge=True, arch="GridNet",
                 filters_level=(4, 6, 8), compute_dtype="float32",
                 workers=1, path=str(tmp_path), mesh_shape=(1,),
                 rollout_frames=1)
    t = Trainer(cfg)
    t.epoch = 1
    t.save_checkpoint()
    import os
    ck = os.path.join(str(tmp_path), "checkpoint", "001")

    hned = HNED()
    pred = LayoutPredictor.from_checkpoint(
        ck, arch="GridNet", n_frames=1, batch=2, image_hw=(32, 32),
        filters_level=(4, 6, 8), use_bf16=False, hned=hned,
        hned_params=t.hned_params, use_edges=True)
    img = np.zeros((2, 32, 32, 3), np.float32)
    seg = np.zeros((2, 32, 32), np.int32)
    frames, layouts = pred.predict(img, img, seg, seg)
    assert frames.shape == (2, 1, 32, 32, 3)
    assert layouts.shape == (2, 1, 32, 32)


def test_predict_quantize_transfer_close_to_exact(ckpt_path):
    # uint8 transfer quantizes BOTH directions: seed frames upload at
    # 1/255 (training's transfer_uint8 semantics; the network propagates
    # that input perturbation) and output frames fetch at 1/255; layout
    # ids are exact both ways
    kw = dict(arch="GridNet", n_frames=2, batch=2, image_hw=(32, 32),
              filters_level=(4, 6, 8), use_bf16=False)
    a = LayoutPredictor.from_checkpoint(ckpt_path, **kw)
    b = LayoutPredictor.from_checkpoint(ckpt_path,
                                        quantize_transfer=True, **kw)
    rng = np.random.default_rng(3)
    img1, img2 = (rng.random((2, 32, 32, 3)).astype(np.float32)
                  for _ in range(2))
    seg1, seg2 = (rng.integers(0, 20, (2, 32, 32)) for _ in range(2))
    f0, l0 = a.predict(img1, img2, seg1, seg2)
    f1, l1 = b.predict(img1, img2, seg1, seg2)
    # output term bounded by 0.5/255; the input term is a ~1/255 seed
    # perturbation through a 1-Lipschitz-ish small net — allow ~5x;
    # layout argmax may flip on borderline pixels only
    assert np.abs(f0 - f1).max() <= 0.01
    assert (l0 != l1).mean() < 0.05

    # exact-seed invariance: uint8-representable seeds round-trip the
    # upload exactly, so only the output quantization term remains and
    # layouts are bit-exact
    img1q = (np.round(img1 * 255.0) / 255.0).astype(np.float32)
    img2q = (np.round(img2 * 255.0) / 255.0).astype(np.float32)
    f0q, l0q = a.predict(img1q, img2q, seg1, seg2)
    f1q, l1q = b.predict(img1q, img2q, seg1, seg2)
    assert np.abs(f0q - f1q).max() <= (0.5 / 255 + 1e-6)
    np.testing.assert_array_equal(l0q, l1q)


def test_predict_pipelined_matches_predict(ckpt_path):
    """predict_pipelined runs the same compiled program with overlapped
    scheduling — results must be bit-identical to per-request predict(),
    in request order, for any pipeline depth."""
    pred = LayoutPredictor.from_checkpoint(
        ckpt_path, arch="GridNet", n_frames=2, batch=4,
        image_hw=(32, 32), filters_level=(4, 6, 8), use_bf16=False)
    rng = np.random.default_rng(3)
    reqs = []
    for i in range(5):
        n = 4 if i % 2 == 0 else 2      # mixed request sizes
        img1 = rng.random((n, 32, 32, 3)).astype(np.float32)
        img2 = rng.random((n, 32, 32, 3)).astype(np.float32)
        seg1 = rng.integers(0, 20, (n, 32, 32))
        seg2 = rng.integers(0, 20, (n, 32, 32))
        reqs.append((img1, img2, seg1, seg2))
    want = [pred.predict(*r) for r in reqs]
    for depth in (1, 2, 3):
        got = list(pred.predict_pipelined(iter(reqs), depth=depth))
        assert len(got) == len(want)
        for (gf, gl), (wf, wl) in zip(got, want):
            np.testing.assert_array_equal(gf, wf)
            np.testing.assert_array_equal(gl, wl)

    with pytest.raises(ValueError):
        list(pred.predict_pipelined(iter(reqs), depth=0))


def test_predict_mesh_sharded_matches_single_device(ckpt_path):
    """Serving on a data mesh (batch sharded, params replicated — the
    reference's DataParallel-eval counterpart, src/val.py:130-131) must
    produce the single-device results exactly (fp32)."""
    import jax

    from video_layout_generation_tpu.parallel.mesh import make_mesh

    kw = dict(arch="GridNet", n_frames=2, batch=8, image_hw=(32, 32),
              filters_level=(4, 6, 8), use_bf16=False)
    single = LayoutPredictor.from_checkpoint(ckpt_path, **kw)
    meshed = LayoutPredictor.from_checkpoint(
        ckpt_path, mesh=make_mesh(jax.devices()[:4]), **kw)
    rng = np.random.default_rng(5)
    img1 = rng.random((6, 32, 32, 3)).astype(np.float32)   # n=6 < batch=8
    img2 = rng.random((6, 32, 32, 3)).astype(np.float32)
    seg1 = rng.integers(0, 20, (6, 32, 32))
    seg2 = rng.integers(0, 20, (6, 32, 32))
    wf, wl = single.predict(img1, img2, seg1, seg2)
    gf, gl = meshed.predict(img1, img2, seg1, seg2)
    np.testing.assert_array_equal(gf, wf)
    np.testing.assert_array_equal(gl, wl)

    with pytest.raises(ValueError):   # batch not divisible by mesh size
        LayoutPredictor.from_checkpoint(
            ckpt_path, mesh=make_mesh(jax.devices()[:3]), **kw)


def test_predict_pipelined_on_mesh(ckpt_path):
    """Pipelining composes with mesh-sharded serving (depth-bounded
    in-flight requests, batch sharded over the mesh): results must equal
    single-device per-request predict exactly."""
    import jax

    from video_layout_generation_tpu.parallel.mesh import make_mesh

    kw = dict(arch="GridNet", n_frames=2, batch=4, image_hw=(32, 32),
              filters_level=(4, 6, 8), use_bf16=False)
    single = LayoutPredictor.from_checkpoint(ckpt_path, **kw)
    meshed = LayoutPredictor.from_checkpoint(
        ckpt_path, mesh=make_mesh(jax.devices()[:2]), **kw)
    rng = np.random.default_rng(9)
    reqs = []
    for _ in range(3):
        img = rng.random((4, 32, 32, 3)).astype(np.float32)
        seg = rng.integers(0, 20, (4, 32, 32))
        reqs.append((img, img, seg, seg))
    want = [single.predict(*r) for r in reqs]
    got = list(meshed.predict_pipelined(iter(reqs), depth=2))
    for (gf, gl), (wf, wl) in zip(got, want):
        np.testing.assert_array_equal(gf, wf)
        np.testing.assert_array_equal(gl, wl)


def test_predict_many_chunks_oversized_requests(ckpt_path):
    """predict_many splits an N > compiled-batch request into pipelined
    chunks and reassembles; equal to concatenated per-chunk predicts."""
    pred = LayoutPredictor.from_checkpoint(
        ckpt_path, arch="GridNet", n_frames=2, batch=4,
        image_hw=(32, 32), filters_level=(4, 6, 8), use_bf16=False)
    rng = np.random.default_rng(13)
    n = 10                                       # 4 + 4 + 2 chunks
    img1 = rng.random((n, 32, 32, 3)).astype(np.float32)
    img2 = rng.random((n, 32, 32, 3)).astype(np.float32)
    seg1 = rng.integers(0, 20, (n, 32, 32))
    seg2 = rng.integers(0, 20, (n, 32, 32))
    gf, gl = pred.predict_many(img1, img2, seg1, seg2)
    assert gf.shape == (n, 2, 32, 32, 3) and gl.shape == (n, 2, 32, 32)
    for lo in (0, 4, 8):
        hi = min(lo + 4, n)
        wf, wl = pred.predict(img1[lo:hi], img2[lo:hi],
                              seg1[lo:hi], seg2[lo:hi])
        np.testing.assert_array_equal(gf[lo:hi], wf)
        np.testing.assert_array_equal(gl[lo:hi], wl)

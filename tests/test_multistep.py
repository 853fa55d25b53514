"""Multi-step (backprop-through-rollout) training — train/multistep.py.

Key invariant: K=1 reproduces the reference objective EXACTLY (same loss,
same updated params as make_train_step on the equivalent triplet batch);
K>1 runs BPTT through the scan with gradients reaching every parameter.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_layout_generation_tpu.config import Config
from video_layout_generation_tpu.data.pipeline import (encode_batch_uint8,
                                                       pack_triplet_batch)
from video_layout_generation_tpu.data.synthetic import SyntheticTriplets
from video_layout_generation_tpu.losses.combined import CombinedLoss
from video_layout_generation_tpu.models import GridNet
from video_layout_generation_tpu.train.multistep import (
    decode_window_batch, make_multistep_train_step, window_to_triplet_batch)
from video_layout_generation_tpu.train.state import TrainState, make_optimizer
from video_layout_generation_tpu.train.steps import make_train_step

_HW = 32


def _window_batch(n=2, t=4, seed=0):
    """Stacked window batch with a linearly-moving pattern."""
    rng = np.random.default_rng(seed)
    imgs = rng.random((n, t, _HW, _HW, 3)).astype(np.float32)
    segs = rng.integers(0, 20, (n, t, _HW, _HW)).astype(np.int32)
    return {"imgs": imgs, "segs": segs}


def _setup(n_channels=10):
    model = GridNet(n_channels=n_channels, dtype=None,
                    filters_level=(4, 6, 8))
    params = model.init(jax.random.key(0),
                        jnp.zeros((1, _HW, _HW, n_channels), jnp.float32))
    state = TrainState.create(params, make_optimizer("adam", 1e-3, 0.5))
    combined = CombinedLoss.create(None, None, image_hw=(_HW, _HW))
    return model, state, combined


def _hned():
    from video_layout_generation_tpu.models import HNED
    hned = HNED(dtype=None)
    hp = hned.init(jax.random.key(1), jnp.zeros((1, _HW, _HW, 3),
                                                jnp.float32))
    return hned, hp


def test_k1_equals_reference_train_step():
    """Multi-step with K=1 must produce the identical loss and updated
    params as the single-step reference train step."""
    model, state, combined = _setup()
    hned, hp = _hned()
    win = _window_batch(t=3)
    trip = window_to_triplet_batch(win)

    ms_step = make_multistep_train_step(model.apply, hned.apply, combined,
                                        k=1, donate=False)
    ref_step = make_train_step(model.apply, hned.apply, combined,
                               donate=False)
    rng = jax.random.key(5)
    s_ms, m_ms = ms_step(state, hp, win, rng)
    s_ref, m_ref = ref_step(state, hp, trip, rng)
    # loss is bit-identical (same math); updated params carry fp
    # reassociation noise from the structurally different backward
    # (scan vs inline), amplified by Adam's per-element normalizer
    np.testing.assert_array_equal(float(m_ms["loss"]), float(m_ref["loss"]))
    for a, b in zip(jax.tree_util.tree_leaves(s_ms.params),
                    jax.tree_util.tree_leaves(s_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_k1_equals_reference_when_flipped():
    """Same equivalence on a flip-coin step (edges extracted pre-flip)."""
    model, state, combined = _setup()
    hned, hp = _hned()
    win = _window_batch(t=3, seed=3)
    trip = window_to_triplet_batch(win)
    ms_step = make_multistep_train_step(model.apply, hned.apply, combined,
                                        k=1, donate=False)
    ref_step = make_train_step(model.apply, hned.apply, combined,
                               donate=False)
    # find an rng whose coin is True
    rng = None
    for i in range(20):
        cand = jax.random.key(100 + i)
        if bool(jax.random.bernoulli(cand)):
            rng = cand
            break
    assert rng is not None
    s_ms, m_ms = ms_step(state, hp, win, rng)
    s_ref, m_ref = ref_step(state, hp, trip, rng)
    np.testing.assert_allclose(float(m_ms["loss"]), float(m_ref["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_ms.params),
                    jax.tree_util.tree_leaves(s_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.parametrize("use_edges", [True, False])
def test_k3_trains_and_reaches_all_params(use_edges):
    model, state, combined = _setup(n_channels=10 if use_edges else 8)
    if use_edges:
        hned, hp = _hned()
        apply, hpar = hned.apply, hp
    else:
        apply, hpar = None, None
    win = _window_batch(t=5)
    step = make_multistep_train_step(model.apply, apply, combined, k=3,
                                     donate=False)
    new_state, metrics = step(state, hpar, win, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))
    assert metrics["loss_per_step"].shape == (3,)
    assert all(np.isfinite(float(v)) for v in metrics["loss_per_step"])
    # every parameter must move (BPTT reaches the whole grid)
    moved = [not np.array_equal(np.asarray(a), np.asarray(b))
             for a, b in zip(jax.tree_util.tree_leaves(state.params),
                             jax.tree_util.tree_leaves(new_state.params))]
    assert all(moved), f"{moved.count(False)} params did not move"


def test_remat_matches_no_remat():
    """jax.checkpoint over the scan body must not change the math."""
    model, state, combined = _setup(n_channels=8)
    win = _window_batch(t=4, seed=9)
    s_a, m_a = make_multistep_train_step(model.apply, None, combined, k=2,
                                         remat_steps=True, donate=False)(
        state, None, win, jax.random.key(2))
    s_b, m_b = make_multistep_train_step(model.apply, None, combined, k=2,
                                         remat_steps=False, donate=False)(
        state, None, win, jax.random.key(2))
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_a.params),
                    jax.tree_util.tree_leaves(s_b.params)):
        # remat recomputes the forward -> different fused backward program;
        # fp reassociation noise again passes through Adam's normalizer
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_packedseq_transfer_roundtrip():
    """uint8 window batches pack to ONE array and decode exactly."""
    win = _window_batch(t=4, seed=4)
    # quantize the float frames the way the pipeline would
    win_q = {"imgs": ((win["imgs"] * 255.0 + 0.5).astype(np.uint8)
                      .astype(np.float32) / 255.0),
             "segs": win["segs"]}
    packed = pack_triplet_batch(encode_batch_uint8(win))
    assert set(packed) == {"packedseq"}
    assert packed["packedseq"].dtype == np.uint8
    assert packed["packedseq"].shape == (2, 4, _HW, _HW, 4)
    imgs, segs = decode_window_batch(
        {k: jnp.asarray(v) for k, v in packed.items()})
    np.testing.assert_allclose(np.asarray(imgs), win_q["imgs"], atol=1e-7)
    np.testing.assert_array_equal(np.asarray(segs), win_q["segs"])


def test_synthetic_window_contract_consistent_with_triplet():
    """n_frames>3 windows agree frame-for-frame with the triplet dataset
    (same seed/index), and sequence() matches __getitem__."""
    tri = SyntheticTriplets(4, (_HW, _HW), seed=7)
    win = SyntheticTriplets(4, (_HW, _HW), seed=7, n_frames=5)
    a, b = tri[2], win[2]
    assert b["imgs"].shape == (5, _HW, _HW, 3)
    assert b["segs"].shape == (5, _HW, _HW)
    np.testing.assert_allclose(b["imgs"][0], a["img1"], atol=1e-6)
    np.testing.assert_allclose(b["imgs"][2], a["img3"], atol=1e-6)
    np.testing.assert_array_equal(b["segs"][1], a["seg2"][..., 0])
    np.testing.assert_array_equal(b["segs"][2], a["seg3"])
    imgs, segs = win.sequence(2, 5)
    # sequence() renders raw floats; __getitem__ goes through the uint8
    # sample cache -> up to 0.5/255 quantization difference
    np.testing.assert_allclose(imgs, b["imgs"], atol=2e-3)
    np.testing.assert_array_equal(segs, b["segs"])


def test_trainer_multistep_e2e(tmp_path):
    """Trainer wiring: one multi-step epoch end to end (synthetic windows,
    packed uint8 transfer, validation on triplets, checkpoint)."""
    from video_layout_generation_tpu.train import Trainer
    cfg = Config(dataset="synthetic", synthetic_train_size=8,
                 synthetic_val_size=4, image_size=(_HW, _HW), batch_size=4,
                 epochs=1, edge=True, arch="GridNet", multistep_k=2,
                 filters_level=(4, 6, 8), compute_dtype="float32",
                 workers=2, mesh_shape=(1,), path=str(tmp_path),
                 rollout_frames=3)
    t = Trainer(cfg)
    m = t.fit()
    assert np.isfinite(m["loss"])
    assert "miou" in m


def test_multistep_dp_step_matches_single_device():
    """8-device sharded multistep step == single-device (the window batch
    shards on axis 0; loss mean-reductions make XLA insert the grad
    allreduce, same as the triplet step)."""
    from video_layout_generation_tpu.parallel.mesh import (make_mesh,
                                                           shard_batch)
    devices = jax.devices()
    assert len(devices) >= 8, "conftest must fake 8 CPU devices"
    model = GridNet(n_channels=8, filters_level=(4, 6, 8))
    combined = CombinedLoss.create(image_hw=(16, 16))
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, 16, 16, 8)))
    step = make_multistep_train_step(model.apply, None, combined, k=2,
                                     donate=False)
    rng_d = np.random.default_rng(11)
    host = {"imgs": rng_d.random((8, 4, 16, 16, 3)).astype(np.float32),
            "segs": rng_d.integers(0, 20, (8, 4, 16, 16)).astype(np.int32)}
    rng = jax.random.key(7)
    tx = make_optimizer("adam", 2e-4, 0.5)

    s1 = TrainState.create(params, tx)
    s1, m1 = step(s1, None, jax.tree_util.tree_map(jnp.asarray, host), rng)

    mesh = make_mesh(devices=devices[:8])
    with jax.set_mesh(mesh):
        s8 = TrainState.create(params, tx)
        s8, m8 = step(s8, None, shard_batch(host, mesh), rng)

    assert abs(float(m1["loss"]) - float(m8["loss"])) < 1e-3
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-4)


def test_layout_noise_zero_is_exact_and_positive_perturbs():
    """layout_noise=0 must leave the objective bit-identical to the plain
    K-step program; layout_noise>0 must change the loss (the fed-back
    layout actually gets corrupted) while still training (finite loss,
    same structure)."""
    model, state, combined = _setup(n_channels=8)
    win = _window_batch(t=5, seed=3)
    rng = jax.random.key(9)

    def loss_of(**kw):
        step = make_multistep_train_step(model.apply, None, combined, 3,
                                         jit=False, **kw)
        st = jax.tree_util.tree_map(jnp.copy, state)
        _, m = step(st, None, win, rng)
        return float(m["loss"])

    base = loss_of()
    zero = loss_of(layout_noise=0.0)
    assert base == zero
    noisy = loss_of(layout_noise=0.3)
    assert np.isfinite(noisy) and noisy != base
    # composes with the frame-noise lever
    both = loss_of(layout_noise=0.3, feedback_noise=0.1)
    assert np.isfinite(both) and both != noisy


def test_image_weight_levers_default_exact_and_renormalized():
    """image_weight=1 + image_discount=1 must be bit-identical to the plain
    K-step objective; image_weight=m must reproduce the closed-form
    renormalized total r*(m*(l1+style)+seg) computed from the baseline
    term metrics (r = sum(w)/ (m*(w_l1+w_style)+w_seg))."""
    model, state, combined = _setup(n_channels=8)
    win = _window_batch(t=5, seed=4)
    rng = jax.random.key(10)

    def metrics_of(**kw):
        step = make_multistep_train_step(model.apply, None, combined, 3,
                                         jit=False, **kw)
        st = jax.tree_util.tree_map(jnp.copy, state)
        _, m = step(st, None, win, rng)
        return {k: float(v) for k, v in m.items() if not k.endswith("step")}

    base = metrics_of()
    same = metrics_of(image_weight=1.0, image_discount=1.0)
    assert base["loss"] == same["loss"]

    m2 = metrics_of(image_weight=2.0)
    r = 70.0 / (2.0 * 60.0 + 10.0)
    want = r * (2.0 * (base["loss_l1"] + base["loss_style"])
                + base["loss_seg"])
    np.testing.assert_allclose(m2["loss"], want, rtol=1e-5)


def test_image_discount_matches_discount_when_seg_weight_zero():
    """With w_seg=0 every loss term is an image term, so the early-up
    image_discount profile g**i (mean-normalized) must equal the late-up
    discount profile d**(K-1-i) at d=1/g — the two weightings are the same
    set of normalized weights."""
    model, state, combined = _setup(n_channels=8)
    win = _window_batch(t=4, seed=5)
    rng = jax.random.key(11)

    def loss_of(**kw):
        step = make_multistep_train_step(model.apply, None, combined, 2,
                                         w_seg=0.0, jit=False, **kw)
        st = jax.tree_util.tree_map(jnp.copy, state)
        _, m = step(st, None, win, rng)
        return float(m["loss"])

    gamma = loss_of(image_discount=0.5)
    dual = loss_of(discount=2.0)
    np.testing.assert_allclose(gamma, dual, rtol=1e-6)
    # and the lever actually moves the objective
    assert gamma != loss_of()

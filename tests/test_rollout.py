"""Rollout semantics: the lax.scan program must equal a hand-rolled python
autoregressive loop over the same model (SURVEY.md §3.3)."""

import jax
import jax.numpy as jnp
import numpy as np

from video_layout_generation_tpu.models import GridNet
from video_layout_generation_tpu.train.assemble import (
    assemble_model_input, normalize_model_output)
from video_layout_generation_tpu.train.rollout import make_rollout_fn


def test_scan_rollout_matches_python_loop():
    h = w = 16
    model = GridNet(n_channels=8, filters_level=(4, 6, 8))
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, h, w, 8)))
    rng = np.random.default_rng(0)
    img1 = jnp.asarray(rng.standard_normal((2, h, w, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.standard_normal((2, h, w, 3)).astype(np.float32))
    seg1 = jnp.asarray(rng.integers(0, 20, (2, h, w, 1)).astype(np.float32))
    seg2 = jnp.asarray(rng.integers(0, 20, (2, h, w, 1)).astype(np.float32))

    rollout = make_rollout_fn(model.apply, None, n_frames=3,
                              use_edges=False)
    imgs, segs = rollout(params, None, img1, img2, seg1, seg2)

    # reference python loop (sliding window of last two)
    fs, ss = [img1, img2], [seg1, seg2]
    apply = jax.jit(model.apply)
    for _ in range(3):
        x = assemble_model_input(ss[-2], fs[-2], fs[-1], ss[-1])
        logits, im = apply(params, x)
        im_n = normalize_model_output(im)
        s_n = jnp.argmax(logits, axis=-1)[..., None].astype(jnp.float32)
        fs.append(im_n)
        ss.append(s_n)

    for t in range(3):
        np.testing.assert_allclose(np.asarray(imgs[:, t]),
                                   np.asarray(fs[2 + t]), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(segs[:, t]),
                                      np.asarray(ss[2 + t]))


def test_edge_rollout_carries_edges_consistently():
    # with edges: the carried-edge optimization must equal recomputing both
    # edges every step
    from video_layout_generation_tpu.models import HNED
    from video_layout_generation_tpu.train.assemble import (
        denormalize_image)

    h = w = 16
    model = GridNet(n_channels=10, filters_level=(4, 6, 8))
    hned = HNED()
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, h, w, 10)))
    hp = jax.jit(hned.init)(jax.random.key(1), jnp.zeros((1, h, w, 3)))
    rng = np.random.default_rng(1)
    img1 = jnp.asarray(rng.standard_normal((1, h, w, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.standard_normal((1, h, w, 3)).astype(np.float32))
    seg1 = jnp.asarray(rng.integers(0, 20, (1, h, w, 1)).astype(np.float32))
    seg2 = jnp.asarray(rng.integers(0, 20, (1, h, w, 1)).astype(np.float32))

    ro = make_rollout_fn(model.apply, hned.apply, n_frames=2,
                         use_edges=True)
    imgs, segs = ro(params, hp, img1, img2, seg1, seg2)

    # naive loop recomputing both edges each step
    fs, ss = [img1, img2], [seg1, seg2]
    for _ in range(2):
        e_old = hned.apply(hp, denormalize_image(fs[-2]))[-1]
        e_new = hned.apply(hp, denormalize_image(fs[-1]))[-1]
        x = assemble_model_input(ss[-2], fs[-2], fs[-1], ss[-1],
                                 e_old, e_new)
        logits, im = model.apply(params, x)
        fs.append(normalize_model_output(im))
        ss.append(jnp.argmax(logits, axis=-1)[..., None].astype(jnp.float32))

    for t in range(2):
        np.testing.assert_allclose(np.asarray(imgs[:, t]),
                                   np.asarray(fs[2 + t]), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(segs[:, t]),
                                      np.asarray(ss[2 + t]))


def test_edge_scale_rollout_matches_downsampled_reference():
    # edge_scale=2: HNED runs on the 1/2 bilinear downsample; the fused map
    # is upsampled back. The scan must equal the same math in a python loop.
    from video_layout_generation_tpu.models import HNED
    from video_layout_generation_tpu.ops.resize import resize_bilinear
    from video_layout_generation_tpu.train.assemble import denormalize_image

    h = w = 32  # HNED's 4 pools need >=16px after the 1/2 downsample
    model = GridNet(n_channels=10, filters_level=(4, 6, 8))
    hned = HNED()
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, h, w, 10)))
    hp = jax.jit(hned.init)(jax.random.key(1), jnp.zeros((1, h, w, 3)))
    rng = np.random.default_rng(2)
    img1 = jnp.asarray(rng.standard_normal((1, h, w, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.standard_normal((1, h, w, 3)).astype(np.float32))
    seg1 = jnp.asarray(rng.integers(0, 20, (1, h, w, 1)).astype(np.float32))
    seg2 = jnp.asarray(rng.integers(0, 20, (1, h, w, 1)).astype(np.float32))

    ro = make_rollout_fn(model.apply, hned.apply, n_frames=2,
                         use_edges=True, edge_scale=2)
    imgs, segs = ro(params, hp, img1, img2, seg1, seg2)

    def edge(f):
        im = denormalize_image(f)
        small = resize_bilinear(im, (h // 2, w // 2), align_corners=False)
        e = hned.apply(hp, small)[-1]
        return resize_bilinear(e, (h, w), align_corners=False)

    fs, ss = [img1, img2], [seg1, seg2]
    for _ in range(2):
        x = assemble_model_input(ss[-2], fs[-2], fs[-1], ss[-1],
                                 edge(fs[-2]), edge(fs[-1]))
        logits, im = model.apply(params, x)
        fs.append(normalize_model_output(im))
        ss.append(jnp.argmax(logits, axis=-1)[..., None].astype(jnp.float32))

    for t in range(2):
        np.testing.assert_allclose(np.asarray(imgs[:, t]),
                                   np.asarray(fs[2 + t]), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(segs[:, t]),
                                      np.asarray(ss[2 + t]))


def test_rollout_upsample_nearest_knob():
    """Opt-in rollout_upsample='nearest' (BENCH_NOTES cost map: the
    bilinear stencil is ~14% of the packed rollout): both packed executors
    run, produce the right shapes, exactly match a flax-model rollout whose
    up blocks use nearest interpolation, and differ from the default
    bilinear path. Default ('bilinear') must remain the exact reference
    math (covered by the parity tests)."""
    import pytest

    from video_layout_generation_tpu.models.fast_gridnet import (
        _up_mode, make_packed_rollout_fn)

    h = w = 16
    model = GridNet(n_channels=8, filters_level=(4, 6, 8))
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, h, w, 8)))
    rng = np.random.default_rng(3)
    img1 = jnp.asarray(rng.standard_normal((2, h, w, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.standard_normal((2, h, w, 3)).astype(np.float32))
    seg1 = jnp.asarray(rng.integers(0, 20, (2, h, w, 1)).astype(np.float32))
    seg2 = jnp.asarray(rng.integers(0, 20, (2, h, w, 1)).astype(np.float32))

    for packing in ("1x2", "2x2"):
        ro_bi = make_packed_rollout_fn(n_frames=2, dtype=None,
                                       packing=packing)
        ro_nn = make_packed_rollout_fn(n_frames=2, dtype=None,
                                       packing=packing, upsample="nearest")
        imgs_bi, segs_bi = ro_bi(params, img1, img2, seg1, seg2)
        imgs_nn, segs_nn = ro_nn(params, img1, img2, seg1, seg2)
        assert imgs_nn.shape == (2, 2, h, w, 3)
        assert segs_nn.shape == (2, 2, h, w, 1)
        assert np.all(np.isfinite(np.asarray(imgs_nn)))
        assert not np.allclose(np.asarray(imgs_bi), np.asarray(imgs_nn)), \
            packing

    with pytest.raises(ValueError):
        _up_mode("bicubic")


def test_rollout_upsample_env_override(monkeypatch):
    from video_layout_generation_tpu.models.fast_gridnet import _up_mode
    monkeypatch.setenv("VLG_ROLLOUT_UP", "nearest")
    assert _up_mode(None) == "nearest"
    assert _up_mode("bilinear") == "nearest"   # env wins
    monkeypatch.delenv("VLG_ROLLOUT_UP")
    assert _up_mode(None) == "bilinear"


def test_apply_upsample_explicit_only(monkeypatch):
    """make_packed_gridnet_apply's upsample is explicit-only: the
    VLG_ROLLOUT_UP env override must NOT leak into train/eval applies
    (training gradients must stay exact vs the flax model)."""
    from video_layout_generation_tpu.models.fast_gridnet import (
        make_packed_gridnet_apply)

    h = w = 16
    model = GridNet(n_channels=10, filters_level=(4, 6, 8))
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, h, w, 10)))
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, h, w, 10)).astype(np.float32))

    for packing in ("1x2", "2x2"):
        ref_seg, _ = make_packed_gridnet_apply(
            dtype=None, packing=packing)(params, x)
        monkeypatch.setenv("VLG_ROLLOUT_UP", "nearest")
        env_seg, _ = make_packed_gridnet_apply(
            dtype=None, packing=packing)(params, x)
        monkeypatch.delenv("VLG_ROLLOUT_UP")
        np.testing.assert_allclose(np.asarray(ref_seg),
                                   np.asarray(env_seg), atol=0), packing
        nn_seg, _ = make_packed_gridnet_apply(
            dtype=None, packing=packing, upsample="nearest")(params, x)
        assert not np.allclose(np.asarray(ref_seg), np.asarray(nn_seg)), \
            packing


def test_rollout_packing_auto_dispatch():
    """Default rollout packing is 'auto': per-call batch dispatch to the
    measured-fastest scheme (2x2 for b8-b64, 1x2 otherwise). Outputs must
    equal the explicit scheme fns exactly (fp32)."""
    from video_layout_generation_tpu.models.fast_gridnet import (
        make_packed_rollout_fn)

    h = w = 16
    model = GridNet(n_channels=8, filters_level=(4, 6, 8))
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, h, w, 8)))
    rng = np.random.default_rng(7)
    ro_auto = make_packed_rollout_fn(n_frames=2, dtype=None)
    for b, scheme in ((4, "1x2"), (8, "2x2")):
        img1 = jnp.asarray(
            rng.standard_normal((b, h, w, 3)).astype(np.float32))
        img2 = jnp.asarray(
            rng.standard_normal((b, h, w, 3)).astype(np.float32))
        seg1 = jnp.asarray(
            rng.integers(0, 20, (b, h, w, 1)).astype(np.float32))
        seg2 = jnp.asarray(
            rng.integers(0, 20, (b, h, w, 1)).astype(np.float32))
        ro_ref = make_packed_rollout_fn(n_frames=2, dtype=None,
                                        packing=scheme)
        ia, sa = ro_auto(params, img1, img2, seg1, seg2)
        ir, sr = ro_ref(params, img1, img2, seg1, seg2)
        np.testing.assert_array_equal(np.asarray(ia), np.asarray(ir)), b
        np.testing.assert_array_equal(np.asarray(sa), np.asarray(sr)), b


def test_rollout_scan_unroll_exact():
    """The scan-unroll knob is a pure scheduling change: unrolled rollouts
    must equal the unroll=1 program exactly (fp32) for both packings."""
    from video_layout_generation_tpu.models.fast_gridnet import (
        make_packed_rollout_fn)

    h = w = 16
    b = 2
    model = GridNet(n_channels=8, filters_level=(4, 6, 8))
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, h, w, 8)))
    rng = np.random.default_rng(11)
    img1 = jnp.asarray(rng.standard_normal((b, h, w, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.standard_normal((b, h, w, 3)).astype(np.float32))
    seg1 = jnp.asarray(rng.integers(0, 20, (b, h, w, 1)).astype(np.float32))
    seg2 = jnp.asarray(rng.integers(0, 20, (b, h, w, 1)).astype(np.float32))
    for packing in ("1x2", "2x2"):
        ro1 = make_packed_rollout_fn(n_frames=4, dtype=None,
                                     packing=packing)
        ro4 = make_packed_rollout_fn(n_frames=4, dtype=None,
                                     packing=packing, unroll=4)
        i1, s1 = ro1(params, img1, img2, seg1, seg2)
        i4, s4 = ro4(params, img1, img2, seg1, seg2)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i4))
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s4))


def test_edge_rollout_apply_batch_dispatch():
    """make_edge_rollout_apply is batch-adaptive (2x2 for b32-b64, 1x2
    otherwise — v5e edge-mode sweep). Both schemes are exact, so the
    dispatching rollout must equal the explicit-scheme rollouts exactly
    (fp32) on either side of the crossover."""
    from video_layout_generation_tpu.models import HNED
    from video_layout_generation_tpu.models.fast_gridnet import (
        make_edge_rollout_apply, make_packed_gridnet_apply)

    h = w = 16
    model = GridNet(n_channels=10, filters_level=(4, 6, 8))
    hned = HNED()
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, h, w, 10)))
    hp = jax.jit(hned.init)(jax.random.key(1), jnp.zeros((1, h, w, 3)))
    ro_auto = make_rollout_fn(make_edge_rollout_apply(dtype=None),
                              hned.apply, n_frames=2, use_edges=True)
    rng = np.random.default_rng(3)
    for b, scheme in ((4, "1x2"), (32, "2x2")):
        img1 = jnp.asarray(
            rng.standard_normal((b, h, w, 3)).astype(np.float32))
        img2 = jnp.asarray(
            rng.standard_normal((b, h, w, 3)).astype(np.float32))
        seg1 = jnp.asarray(
            rng.integers(0, 20, (b, h, w, 1)).astype(np.float32))
        seg2 = jnp.asarray(
            rng.integers(0, 20, (b, h, w, 1)).astype(np.float32))
        ro_ref = make_rollout_fn(
            make_packed_gridnet_apply(dtype=None, packing=scheme),
            hned.apply, n_frames=2, use_edges=True)
        ia, sa = ro_auto(params, hp, img1, img2, seg1, seg2)
        ir, sr = ro_ref(params, hp, img1, img2, seg1, seg2)
        np.testing.assert_array_equal(np.asarray(ia), np.asarray(ir))
        np.testing.assert_array_equal(np.asarray(sa), np.asarray(sr))

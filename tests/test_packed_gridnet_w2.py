"""1x2 width-packed GridNet executor == flax GridNet, exactly.

Same parity contract as tests/test_packed_gridnet.py for the 2x2 scheme:
the width-packed kernels are a re-indexing of the logical kernels, so in
fp32 the two programs agree to float tolerance."""

import jax
import jax.numpy as jnp
import numpy as np

from video_layout_generation_tpu.models import GridNet
from video_layout_generation_tpu.models.fast_gridnet_w2 import (
    make_packed_gridnet_apply, make_packed_rollout_fn)
from video_layout_generation_tpu.ops.packed import (
    conv_packed1x2_stride2, pack1x2, pack_kernel3x3_1x2_stride2)
from video_layout_generation_tpu.ops.resize import (
    upsample2x_align_to_1x2, upsample2x_bilinear_align)


def test_1x2_stride2_exact():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 4)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 4, 6)).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, w, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = conv_packed1x2_stride2(pack1x2(x), pack_kernel3x3_1x2_stride2(w))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_upsample_to_1x2_matches():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 3)).astype(np.float32))
    ref = pack1x2(upsample2x_bilinear_align(x, exact=True))
    got = upsample2x_align_to_1x2(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_w2_gridnet_matches_flax():
    model = GridNet(n_channels=8, filters_level=(4, 6, 8))
    x = jnp.asarray(np.random.default_rng(3)
                    .standard_normal((2, 16, 16, 8)).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.key(0), x)
    seg_ref, img_ref = jax.jit(model.apply)(variables, x)
    fast = make_packed_gridnet_apply(dtype=jnp.float32)
    seg, img = jax.jit(fast)(variables, x)
    np.testing.assert_allclose(np.asarray(seg), np.asarray(seg_ref),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(img), np.asarray(img_ref),
                               atol=2e-4)


def test_w2_coordgridnet_matches_flax():
    model = GridNet(n_channels=10, filters_level=(4, 6, 8), coord_in=True)
    x = jnp.asarray(np.random.default_rng(4)
                    .standard_normal((2, 16, 16, 10)).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.key(0), x)
    seg_ref, img_ref = jax.jit(model.apply)(variables, x)
    fast = make_packed_gridnet_apply(dtype=jnp.float32, coord_in=True)
    seg, img = jax.jit(fast)(variables, x)
    np.testing.assert_allclose(np.asarray(seg), np.asarray(seg_ref),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(img), np.asarray(img_ref),
                               atol=2e-4)


def test_w2_gridnet_grads_match_flax():
    model = GridNet(n_channels=8, filters_level=(4, 6, 8))
    x = jnp.asarray(np.random.default_rng(5)
                    .standard_normal((1, 16, 16, 8)).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.key(0), x)
    fast = make_packed_gridnet_apply(dtype=jnp.float32)

    def loss_ref(v):
        s, i = model.apply(v, x)
        return jnp.sum(s ** 2) + jnp.sum(i ** 2)

    def loss_fast(v):
        s, i = fast(v, x)
        return jnp.sum(s ** 2) + jnp.sum(i ** 2)

    g_ref = jax.jit(jax.grad(loss_ref))(variables)
    g_fast = jax.jit(jax.grad(loss_fast))(variables)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_fast)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, rtol=1e-3)


def test_w2_rollout_matches_standard():
    from video_layout_generation_tpu.train.rollout import make_rollout_fn

    model = GridNet(n_channels=8, filters_level=(4, 6, 8))
    rng = np.random.default_rng(6)
    h = w = 16
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((1, h, w, 8)))
    img1 = jnp.asarray(rng.standard_normal((2, h, w, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.standard_normal((2, h, w, 3)).astype(np.float32))
    seg1 = jnp.asarray(rng.integers(0, 20, (2, h, w, 1)).astype(np.float32))
    seg2 = jnp.asarray(rng.integers(0, 20, (2, h, w, 1)).astype(np.float32))

    ref_ro = make_rollout_fn(model.apply, None, n_frames=3, use_edges=False)
    imgs_ref, segs_ref = ref_ro(variables, None, img1, img2, seg1, seg2)
    fast_ro = make_packed_rollout_fn(n_frames=3, dtype=jnp.float32)
    imgs, segs = fast_ro(variables, img1, img2, seg1, seg2)

    np.testing.assert_allclose(np.asarray(imgs), np.asarray(imgs_ref),
                               atol=5e-4)
    np.testing.assert_array_equal(np.asarray(segs), np.asarray(segs_ref))


def test_row0_pack_env_dispatch(monkeypatch):
    # VLG_ROW0_PACK selects the executor scheme at both entry points
    from video_layout_generation_tpu.models import (fast_gridnet,
                                                    fast_gridnet_w2)
    model = GridNet(n_channels=8, filters_level=(4, 6, 8))
    x = jnp.asarray(np.random.default_rng(9)
                    .standard_normal((1, 8, 8, 8)).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.key(0), x)

    monkeypatch.setenv("VLG_ROW0_PACK", "1x2")
    a = fast_gridnet.make_packed_gridnet_apply(dtype=jnp.float32)
    s1, _ = a(variables, x)
    monkeypatch.setenv("VLG_ROW0_PACK", "2x2")
    b = fast_gridnet.make_packed_gridnet_apply(dtype=jnp.float32)
    s2, _ = b(variables, x)
    sw, _ = fast_gridnet_w2.make_packed_gridnet_apply(
        dtype=jnp.float32)(variables, x)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(sw), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=2e-4)

    # per-entry defaults: apply -> 2x2, rollout -> 1x2
    monkeypatch.delenv("VLG_ROW0_PACK", raising=False)
    from video_layout_generation_tpu.models.fast_gridnet import _row0_packing
    assert _row0_packing(None, "2x2") == "2x2"
    assert _row0_packing(None, "1x2") == "1x2"
    assert _row0_packing("2x2", "1x2") == "2x2"


def test_w2_gridnet_512px_and_odd_batch():
    # resolution generality (fixes the reference's hardcoded 256 coord
    # grid, SURVEY.md 2c#9): the w2 executor must match flax at other
    # resolutions and non-power-of-two batch
    model = GridNet(n_channels=8, filters_level=(4, 6, 8))
    x = jnp.asarray(np.random.default_rng(11)
                    .standard_normal((3, 32, 64, 8)).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.key(0), x)
    seg_ref, img_ref = jax.jit(model.apply)(variables, x)
    seg, img = jax.jit(make_packed_gridnet_apply(dtype=jnp.float32))(
        variables, x)
    np.testing.assert_allclose(np.asarray(seg), np.asarray(seg_ref),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(img), np.asarray(img_ref),
                               atol=2e-4)

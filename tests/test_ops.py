"""Golden-value parity tests for ops against torch/cv2 semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from video_layout_generation_tpu import ops


def _rand(*shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


@pytest.mark.parametrize("in_hw,out_hw", [((8, 8), (16, 16)),
                                          ((16, 12), (32, 24)),
                                          ((16, 16), (7, 5))])
def test_bilinear_align_corners_matches_torch(in_hw, out_hw):
    x = _rand(2, *in_hw, 3)
    ours = np.asarray(ops.resize_bilinear(jnp.asarray(x), out_hw,
                                          align_corners=True))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = F.interpolate(xt, size=out_hw, mode="bilinear",
                        align_corners=True).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((8, 8), (32, 32)),
                                          ((13, 9), (26, 18))])
def test_bilinear_half_pixel_matches_torch(in_hw, out_hw):
    x = _rand(1, *in_hw, 2, seed=1)
    ours = np.asarray(ops.resize_bilinear(jnp.asarray(x), out_hw,
                                          align_corners=False))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = F.interpolate(xt, size=out_hw, mode="bilinear",
                        align_corners=False).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_nearest_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    x = (np.random.default_rng(2).integers(0, 20, (37, 53))
         .astype(np.uint8))
    ours = np.asarray(ops.resize_nearest(
        jnp.asarray(x.astype(np.int32))[..., None], (16, 16)))[..., 0]
    ref = cv2.resize(x, dsize=(16, 16), interpolation=cv2.INTER_NEAREST)
    np.testing.assert_array_equal(ours, ref.astype(np.int32))


def test_avg_pool_3x3_matches_torch():
    x = _rand(2, 10, 10, 4, seed=3)
    ours = np.asarray(ops.avg_pool_3x3_valid(jnp.asarray(x)))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = F.avg_pool2d(xt, 3, 1).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_max_pool_2x2_matches_torch():
    x = _rand(1, 8, 8, 3, seed=4)
    ours = np.asarray(ops.max_pool_2x2(jnp.asarray(x)))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = F.max_pool2d(xt, 2, 2).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_colorize_seg_lut():
    seg = jnp.asarray([[0, 13], [19, 1]], jnp.int32)[None]
    rgb = np.asarray(ops.colorize_seg(seg))
    assert rgb.shape == (1, 2, 2, 3)
    np.testing.assert_allclose(rgb[0, 0, 0] * 255, [128, 64, 128], atol=1e-4)
    np.testing.assert_allclose(rgb[0, 1, 0] * 255, [0, 0, 0], atol=1e-4)


def test_colorize_argmax():
    logits = jnp.zeros((1, 2, 2, 20)).at[..., 10].set(5.0)  # sky everywhere
    rgb = np.asarray(ops.colorize_seg(logits, argmax=True))
    np.testing.assert_allclose(rgb[0, 0, 0] * 255, [70, 130, 180], atol=1e-4)


def test_one_hot_matches_eye_indexing():
    seg = jnp.asarray([[0, 2], [1, 4]], jnp.int32)[None]
    oh = np.asarray(ops.seg_one_hot(seg, 5))
    ref = np.eye(5, dtype=np.float32)[np.asarray(seg)]
    np.testing.assert_array_equal(oh, ref)


def test_add_coord_channels_range_and_shape():
    x = jnp.zeros((2, 5, 9, 3))
    y = ops.add_coord_channels(x)
    assert y.shape == (2, 5, 9, 5)
    yy = np.asarray(y)
    # channel -2 varies along H in [-1, 1]; channel -1 along W
    np.testing.assert_allclose(yy[0, :, 0, 3], np.linspace(-1, 1, 5),
                               atol=1e-6)
    np.testing.assert_allclose(yy[0, 0, :, 4], np.linspace(-1, 1, 9),
                               atol=1e-6)


def test_mask2box_matches_reference_semantics():
    from video_layout_generation_tpu.ops.boxes import mask2box
    mask = np.ones((2, 8, 8), np.float32)
    mask[0, 2:5, 3:7] = 0.0       # inner region rows 2-4, cols 3-6
    mask[1, 0:1, 0:1] = 0.0       # single pixel
    boxes = np.asarray(mask2box(jnp.asarray(mask)))
    np.testing.assert_array_equal(boxes[0], [2, 3, 4, 6])
    np.testing.assert_array_equal(boxes[1], [0, 0, 0, 0])


def test_schedules_match_torch_policies():
    import torch
    from video_layout_generation_tpu.train.schedules import (
        PlateauScheduler, cosine_lr, linear_lr, step_lr)
    base = 0.1
    # step vs torch StepLR
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=base)
    sch = torch.optim.lr_scheduler.StepLR(opt, step_size=3, gamma=0.1)
    for epoch in range(8):
        assert abs(step_lr(base, epoch, 3, 0.1)
                   - opt.param_groups[0]["lr"]) < 1e-9
        sch.step()
    # cosine vs torch CosineAnnealingLR
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=base)
    sch = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=10)
    for epoch in range(10):
        assert abs(cosine_lr(base, epoch, 10)
                   - opt.param_groups[0]["lr"]) < 1e-7
        sch.step()
    # linear matches the reference lambda (networks.py:52-54)
    for epoch in range(12):
        lam = 1.0 - max(0, epoch + 1 - 5) / float(6 + 1)
        assert abs(linear_lr(base, epoch, 1, 5, 6) - base * lam) < 1e-9
    # plateau reduces after patience exhausted
    ps = PlateauScheduler(base, patience=2)
    lrs = [ps.update(1.0) for _ in range(5)]
    assert lrs[-1] < base


def test_upsample2x_stencil_matches_matrix_form():
    # the banded stencil (ops/resize.py) must reproduce the interpolation
    # matrix bitwise in fp32 — same coefficients, two nonzero taps per row
    import numpy as np
    from video_layout_generation_tpu.ops.resize import (
        _apply_separable, interp_matrix, upsample2x_bilinear_align_stencil,
        upsample2x_phases)
    from video_layout_generation_tpu.ops.packed import (
        pack2x2, packed_upsample2x_align, packed_upsample2x_align_einsum)
    rng = np.random.default_rng(7)
    for h, w in ((8, 12), (1, 4), (5, 7)):
        x = jnp.asarray(rng.standard_normal((2, h, w, 3)).astype(np.float32))
        ref = _apply_separable(x, interp_matrix(h, 2 * h, "bilinear", True),
                               interp_matrix(w, 2 * w, "bilinear", True),
                               exact=True)
        got = upsample2x_bilinear_align_stencil(x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-6)
    # packed form == pack2x2 of the full upsample, and == einsum form
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 5)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(packed_upsample2x_align(x)),
        np.asarray(packed_upsample2x_align_einsum(x)), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(packed_upsample2x_align(x)),
        np.asarray(pack2x2(upsample2x_bilinear_align_stencil(x))),
        atol=1e-6)


def test_upsample2x_stencil_grad():
    import numpy as np
    from video_layout_generation_tpu.ops.resize import (
        upsample2x_bilinear_align, upsample2x_bilinear_align_stencil)
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((1, 6, 6, 2)).astype(np.float32))
    g1 = jax.grad(lambda z: jnp.sum(
        upsample2x_bilinear_align(z, exact=True) ** 2))(x)
    g2 = jax.grad(lambda z: jnp.sum(
        upsample2x_bilinear_align_stencil(z) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=1e-5)

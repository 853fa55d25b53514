"""Golden-value parity tests for the loss stack vs torch implementations
written inline (test-only; SURVEY.md §4 — golden tests for the three losses).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from video_layout_generation_tpu import losses


def _rand(*shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


def test_l1_matches_torch():
    a, b = _rand(2, 8, 8, 3, seed=0), _rand(2, 8, 8, 3, seed=1)
    ours = float(losses.l1_loss(jnp.asarray(a), jnp.asarray(b)))
    ref = float(F.l1_loss(torch.from_numpy(a), torch.from_numpy(b)))
    assert abs(ours - ref) < 1e-6


def test_gradient_loss_matches_reference_formula():
    a, b = _rand(2, 6, 7, 3, seed=2), _rand(2, 6, 7, 3, seed=3)
    ours = float(losses.gradient_loss(jnp.asarray(a), jnp.asarray(b)))
    at = torch.from_numpy(a).permute(0, 3, 1, 2)
    bt = torch.from_numpy(b).permute(0, 3, 1, 2)
    xl = torch.sum(torch.abs(torch.abs(at[:, :, 1:] - at[:, :, :-1])
                             - torch.abs(bt[:, :, 1:] - bt[:, :, :-1])))
    yl = torch.sum(torch.abs(
        torch.abs(at[:, :, :, 1:] - at[:, :, :, :-1])
        - torch.abs(bt[:, :, :, 1:] - bt[:, :, :, :-1])))
    ref = float((xl + yl) / at.numel())
    assert abs(ours - ref) < 1e-5


def test_ssim_matches_reference_formula():
    a = np.clip(_rand(2, 12, 12, 3, seed=4) * 0.2 + 0.5, 0, 1)
    b = np.clip(_rand(2, 12, 12, 3, seed=5) * 0.2 + 0.5, 0, 1)
    ours = float(losses.ssim_loss(jnp.asarray(a), jnp.asarray(b)))

    def ssim_torch(x, y):  # x,y: (N,H,W) -> scalar, per-channel slice
        C1, C2 = 0.01 ** 2, 0.03 ** 2
        mu_x, mu_y = F.avg_pool2d(x, 3, 1), F.avg_pool2d(y, 3, 1)
        sx = F.avg_pool2d(x ** 2, 3, 1) - mu_x ** 2
        sy = F.avg_pool2d(y ** 2, 3, 1) - mu_y ** 2
        sxy = F.avg_pool2d(x * y, 3, 1) - mu_x * mu_y
        n = (2 * mu_x * mu_y + C1) * (2 * sxy + C2)
        d = (mu_x ** 2 + mu_y ** 2 + C1) * (sx + sy + C2)
        return torch.clamp((1 - n / d) / 2, 0, 1).mean()

    at = torch.from_numpy(a).permute(0, 3, 1, 2)
    bt = torch.from_numpy(b).permute(0, 3, 1, 2)
    ref = float(sum(ssim_torch(at[:, i], bt[:, i]) for i in range(3)))
    assert abs(ours - ref) < 1e-5


def test_cross_entropy_matches_torch():
    logits = _rand(2, 4, 4, 5, seed=6)
    labels = np.random.default_rng(7).integers(0, 5, (2, 4, 4))
    ours = float(losses.cross_entropy_loss(jnp.asarray(logits),
                                           jnp.asarray(labels)))
    lt = torch.from_numpy(logits).permute(0, 3, 1, 2)
    ref = float(F.cross_entropy(lt, torch.from_numpy(labels).long()))
    assert abs(ours - ref) < 1e-4


def test_weighted_masked_ce_matches_torch():
    n_cls = 5
    logits = _rand(1, 4, 4, n_cls, seed=8)
    labels = np.random.default_rng(9).integers(0, n_cls, (1, 4, 4))
    mask = np.zeros((1, 4, 4), np.float32)
    mask[:, 1:3, 1:3] = 1.0
    w = np.linspace(0.2, 1.0, n_cls).astype(np.float32)
    ours = float(losses.weighted_masked_ce(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask), w))
    lt = torch.from_numpy(logits).permute(0, 3, 1, 2)
    total = F.cross_entropy(lt, torch.from_numpy(labels).long(),
                            weight=torch.from_numpy(w), reduction="sum")
    elems = float((1 - mask).nonzero()[0].size)
    ref = float(total) / elems
    assert abs(ours - ref) < 1e-5


@pytest.mark.parametrize("mode", ["lsgan", "vanilla", "wgangp"])
def test_gan_loss_matches_torch(mode):
    pred = _rand(2, 6, 6, 1, seed=10)
    pt = torch.from_numpy(pred)
    for is_real in (True, False):
        ours = float(losses.gan_loss(jnp.asarray(pred), is_real, mode))
        if mode == "lsgan":
            ref = float(F.mse_loss(pt, torch.full_like(pt, float(is_real))))
        elif mode == "vanilla":
            ref = float(F.binary_cross_entropy_with_logits(
                pt, torch.full_like(pt, float(is_real))))
        else:
            ref = float(-pt.mean() if is_real else pt.mean())
        assert abs(ours - ref) < 1e-5, (mode, is_real)


def test_gradient_penalty_unit_critic():
    # critic(x) = sum(x) -> gradient == 1 everywhere -> ||g||_2 = sqrt(D)
    real = np.zeros((2, 4, 4, 1), np.float32)
    fake = np.ones((2, 4, 4, 1), np.float32)
    pen, grads = losses.gradient_penalty(
        lambda z: jnp.sum(z, axis=(1, 2, 3)), jnp.asarray(real),
        jnp.asarray(fake), jax.random.key(0), lambda_gp=10.0)
    expected = 10.0 * (np.sqrt(16.0) - 1.0) ** 2
    assert abs(float(pen) - expected) < 1e-4
    assert grads.shape == real.shape


def test_vgg_feature_loss_zero_for_identical():
    model, params = losses.make_vgg_loss(image_hw=(16, 16))
    x = jnp.asarray(_rand(1, 16, 16, 3, seed=11))
    out = losses.vgg_feature_loss(model, params, x, x)
    assert abs(float(out)) < 1e-7


def test_combined_loss_is_sum_of_terms():
    cl = losses.CombinedLoss.create(image_hw=(16, 16))
    a = jnp.asarray(np.clip(_rand(1, 16, 16, 3, seed=12) * 0.3 + 0.5, 0, 1))
    b = jnp.asarray(np.clip(_rand(1, 16, 16, 3, seed=13) * 0.3 + 0.5, 0, 1))
    total = float(cl(a, b))
    parts = (float(losses.vgg_feature_loss(cl.vgg_model, cl.vgg_params, a, b))
             + float(losses.gradient_loss(a, b))
             + float(losses.ssim_loss(a, b)))
    assert abs(total - parts) < 1e-5

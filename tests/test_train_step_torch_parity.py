"""Integrated train-step parity against a torch recomputation.

The component pieces each have torch goldens (losses in test_losses.py,
HNED in test_weight_convert.py, ConvTranspose in
test_convtranspose_parity.py); this file closes the remaining gap by
checking the *composed* hot loop of the reference's intended training step
(reference src/trainer.py:175-258) end to end with identical weights on
both sides:

  1. the full GridNet forward (3x6 grid, dual heads) — and the
     CoordGridNet input stem;
  2. edges + normalization + 10ch assembly + forward + the 3-term loss
     40*L1 + 20*(VGG+SSIM+Grad) + 10*CE;
  3. the gradients of that loss w.r.t. every GridNet parameter
     (torch autograd vs jax.grad).

The torch side is a functional recomputation written from the documented
block semantics (PReLU-conv-PReLU-conv laterals, stride-2 downs,
align-corners bilinear-x2 ups — reference src/models/modules.py:5-58),
consuming the *converted JAX parameters*, so any layout/transpose mistake
in our NHWC design would show up as a numeric mismatch here.
"""

import os
import sys

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from video_layout_generation_tpu.losses.combined import CombinedLoss
from video_layout_generation_tpu.losses.vgg import load_vgg_params
from video_layout_generation_tpu.models import HNED, GridNet
from video_layout_generation_tpu.train.steps import (make_loss_fn,
                                                     prepare_inputs)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from convert_torch_weights import convert_hned, convert_vgg19  # noqa: E402

from test_weight_convert import (_fake_hned_state_dict,  # noqa: E402
                                 _torch_hned_forward)

# ---------------------------------------------------------------- torch side


def _t_conv(p, x, stride=1):
    """flax nn.Conv params (HWIO kernel) -> torch F.conv2d (OIHW)."""
    k = torch.from_numpy(np.transpose(np.asarray(p["kernel"]), (3, 2, 0, 1)))
    b = torch.from_numpy(np.asarray(p["bias"]))
    return F.conv2d(x, k, b, stride=stride, padding=1)


def _t_conv_p(p, x, stride=1):
    """Same but from a dict of torch tensors (autograd-visible)."""
    return F.conv2d(x, p["kernel"], p["bias"], stride=stride, padding=1)


def _t_prelu(p, x):
    a = p["alpha"]
    return torch.where(x >= 0, x, a * x)


def _t_coords(x):
    """Append the [-1,1] coordinate channels (ops/coords.py convention:
    channel -2 varies along H, channel -1 along W)."""
    n, _, h, w = x.shape
    hh = (torch.arange(h, dtype=x.dtype) / max(h - 1, 1)) * 2 - 1
    ww = (torch.arange(w, dtype=x.dtype) / max(w - 1, 1)) * 2 - 1
    gh = hh.view(1, 1, h, 1).expand(n, 1, h, w)
    gw = ww.view(1, 1, 1, w).expand(n, 1, h, w)
    return torch.cat([x, gh, gw], dim=1)


def _t_lateral(p, x, shortcut=False):
    y = _t_prelu(p["PReLU_0"], x)
    y = _t_conv_p(p["Conv_0"], y)
    y = _t_prelu(p["PReLU_1"], y)
    y = _t_conv_p(p["Conv_1"], y)
    if shortcut:
        y = y + _t_conv_p(p["Conv_2"], x)
    return y


def _t_coord_lateral(p, x, shortcut=False):
    """CoordLateralBlock: coordconv -> PReLU -> coordconv (+ coordconv
    shortcut); note no leading PReLU (models/blocks.py:110-124)."""
    y = _t_conv_p(p["CoordConv_0"]["Conv_0"], _t_coords(x))
    y = _t_prelu(p["PReLU_0"], y)
    y = _t_conv_p(p["CoordConv_1"]["Conv_0"], _t_coords(y))
    if shortcut:
        y = y + _t_conv_p(p["CoordConv_2"]["Conv_0"], _t_coords(x))
    return y


def _t_down(p, x):
    y = _t_prelu(p["PReLU_0"], x)
    y = _t_conv_p(p["Conv_0"], y, stride=2)
    y = _t_prelu(p["PReLU_1"], y)
    y = _t_conv_p(p["Conv_1"], y)
    return y


def _t_up(p, x):
    y = F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=True)
    y = _t_prelu(p["PReLU_0"], y)
    y = _t_conv_p(p["Conv_0"], y)
    y = _t_prelu(p["PReLU_1"], y)
    y = _t_conv_p(p["Conv_1"], y)
    return y


def _torch_gridnet(params, x_nchw, coord_in=False):
    """Functional torch GridNet mirroring models/gridnet.py wiring."""
    p = params["params"]
    if coord_in:
        x0 = _t_coord_lateral(p["lateral_in"], x_nchw, shortcut=True)
    else:
        x0 = _t_lateral(p["lateral_in"], x_nchw, shortcut=True)
    x1 = _t_down(p["down_00"], x0)
    x2 = _t_down(p["down_10"], x1)
    for i in range(1, 6):
        c = p[f"col_{i}"]
        if i < 3:  # encoder column
            x0 = _t_lateral(c[f"lateral_0{i-1}"], x0)
            x1 = _t_down(c[f"down_0{i}"], x0) + _t_lateral(
                c[f"lateral_1{i-1}"], x1)
            x2 = _t_down(c[f"down_1{i}"], x1) + _t_lateral(
                c[f"lateral_2{i-1}"], x2)
        else:      # decoder column
            x2 = _t_lateral(c[f"lateral_2{i-1}"], x2)
            x1 = _t_up(c[f"up_1{i}"], x2) + _t_lateral(
                c[f"lateral_1{i-1}"], x1)
            x0 = _t_up(c[f"up_0{i}"], x1) + _t_lateral(
                c[f"lateral_0{i-1}"], x0)
    seg = _t_lateral(p["lateral_out_seg"], x0)
    img = _t_lateral(p["lateral_out_img"], x0)
    return seg, img


def _torch_params(params):
    """JAX param tree -> nested dict of torch leaf tensors (kernels OIHW,
    requires_grad on every leaf)."""

    def rec(node):
        node = dict(node)  # works for dict and flax FrozenDict alike
        if "kernel" in node:
            k = torch.tensor(
                np.transpose(np.asarray(node["kernel"]), (3, 2, 0, 1)),
                requires_grad=True)
            b = torch.tensor(np.asarray(node["bias"]), requires_grad=True)
            return {"kernel": k, "bias": b}
        if "alpha" in node:
            return {"alpha": torch.tensor(np.asarray(node["alpha"]),
                                          requires_grad=True)}
        return {k: rec(v) for k, v in node.items()}

    return {"params": rec(params["params"])}


def _torch_grad_leaf(tp, path):
    """Fetch the torch grad matching a jax tree path, back in JAX layout."""
    node = tp["params"]
    for key in path[:-1]:
        node = node[key]
    g = node[path[-1]].grad
    assert g is not None, f"no torch grad at {path}"
    g = g.detach().numpy()
    if path[-1] == "kernel":
        g = np.transpose(g, (2, 3, 1, 0))  # OIHW -> HWIO
    return g


# -------------------------------------------------------- torch loss mirror


_IMAGENET_MEAN = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
_IMAGENET_STD = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
_OUT_MEAN = torch.tensor([-0.03, -0.088, -0.188]).view(1, 3, 1, 1)
_OUT_STD = torch.tensor([0.448, 0.448, 0.450]).view(1, 3, 1, 1)

_VGG_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25]
_VGG_WIDTHS = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256),
               (256, 256), (256, 256), (256, 256), (256, 512), (512, 512),
               (512, 512), (512, 512)]
_VGG_POOL_BEFORE = {2, 4, 8}  # conv index (0-based) preceded by a max pool


def _fake_vgg_state_dict(seed=2):
    rng = np.random.default_rng(seed)
    sd = {}
    for idx, (ci, co) in zip(_VGG_CONV_IDX, _VGG_WIDTHS):
        sd[f"features.{idx}.weight"] = torch.from_numpy(
            rng.standard_normal((co, ci, 3, 3)).astype(np.float32) * 0.02)
        sd[f"features.{idx}.bias"] = torch.from_numpy(
            rng.standard_normal(co).astype(np.float32) * 0.01)
    return sd


def _torch_vgg_features(sd, x):
    """VGG19 trunk through relu4_4 (reference src/loss.py:29-49)."""
    for j, idx in enumerate(_VGG_CONV_IDX):
        if j in _VGG_POOL_BEFORE:
            x = F.max_pool2d(x, 2, 2)
        x = F.relu(F.conv2d(x, sd[f"features.{idx}.weight"],
                            sd[f"features.{idx}.bias"], padding=1))
    return x


def _torch_ssim(x, y):
    """Per-channel 3x3-window SSIM loss, summed over channels
    (reference src/loss.py:64-91 semantics, as in test_losses.py)."""
    total = 0.0
    for i in range(x.shape[1]):
        a, b = x[:, i:i + 1], y[:, i:i + 1]
        mu_x = F.avg_pool2d(a, 3, 1)
        mu_y = F.avg_pool2d(b, 3, 1)
        sx = F.avg_pool2d(a * a, 3, 1) - mu_x ** 2
        sy = F.avg_pool2d(b * b, 3, 1) - mu_y ** 2
        sxy = F.avg_pool2d(a * b, 3, 1) - mu_x * mu_y
        n = (2 * mu_x * mu_y + 0.01 ** 2) * (2 * sxy + 0.03 ** 2)
        d = (mu_x ** 2 + mu_y ** 2 + 0.01 ** 2) * (sx + sy + 0.03 ** 2)
        total = total + torch.clamp((1 - n / d) / 2, 0, 1).mean()
    return total


def _torch_gradient_loss(a, b):
    xl = torch.sum(torch.abs(torch.abs(a[:, :, 1:] - a[:, :, :-1])
                             - torch.abs(b[:, :, 1:] - b[:, :, :-1])))
    yl = torch.sum(torch.abs(torch.abs(a[:, :, :, 1:] - a[:, :, :, :-1])
                             - torch.abs(b[:, :, :, 1:] - b[:, :, :, :-1])))
    return (xl + yl) / a.numel()


# ------------------------------------------------------------------- fixtures


def _batch(n=2, h=32, w=32, seed=7):
    rng = np.random.default_rng(seed)
    return {
        "img1": rng.random((n, h, w, 3), np.float32),
        "img2": rng.random((n, h, w, 3), np.float32),
        "img3": rng.random((n, h, w, 3), np.float32),
        "seg1": rng.integers(0, 20, (n, h, w, 1)).astype(np.float32),
        "seg2": rng.integers(0, 20, (n, h, w, 1)).astype(np.float32),
        "seg3": rng.integers(0, 20, (n, h, w)).astype(np.int32),
    }


def _init_gridnet(coord_in=False, n_channels=10, h=32, w=32):
    model = GridNet(n_channels=n_channels, coord_in=coord_in, dtype=None)
    params = model.init(jax.random.key(3),
                        jnp.zeros((1, h, w, n_channels), jnp.float32))
    return model, params


# --------------------------------------------------------------------- tests


def test_gridnet_forward_matches_torch():
    model, params = _init_gridnet()
    x = np.random.default_rng(0).standard_normal(
        (2, 32, 32, 10)).astype(np.float32)
    seg, img = model.apply(params, jnp.asarray(x))
    tp = _torch_params(params)
    with torch.no_grad():
        seg_t, img_t = _torch_gridnet(
            tp, torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    np.testing.assert_allclose(np.asarray(seg),
                               np.transpose(seg_t.numpy(), (0, 2, 3, 1)),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(img),
                               np.transpose(img_t.numpy(), (0, 2, 3, 1)),
                               atol=2e-4)


def test_coordgridnet_forward_matches_torch():
    model, params = _init_gridnet(coord_in=True)
    x = np.random.default_rng(1).standard_normal(
        (2, 32, 32, 10)).astype(np.float32)
    seg, img = model.apply(params, jnp.asarray(x))
    tp = _torch_params(params)
    with torch.no_grad():
        seg_t, img_t = _torch_gridnet(
            tp, torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
            coord_in=True)
    np.testing.assert_allclose(np.asarray(seg),
                               np.transpose(seg_t.numpy(), (0, 2, 3, 1)),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(img),
                               np.transpose(img_t.numpy(), (0, 2, 3, 1)),
                               atol=2e-4)


def test_full_train_loss_and_grads_match_torch(tmp_path):
    """The whole objective: HNED edges + normalize + 10ch assembly +
    GridNet fwd + 40*L1 + 20*(VGG+SSIM+Grad) + 10*CE, loss AND grads."""
    batch = _batch()
    model, params = _init_gridnet()

    # shared frozen artifacts on both sides
    hned_sd = _fake_hned_state_dict()
    np.savez(tmp_path / "hned.npz", **convert_hned(hned_sd))
    vgg_sd = _fake_vgg_state_dict()
    np.savez(tmp_path / "vgg.npz", **convert_vgg19(vgg_sd))

    from video_layout_generation_tpu.io.weights import load_hned_params
    hned_params = load_hned_params(str(tmp_path / "hned.npz"))
    combined = CombinedLoss(
        vgg_model=__import__(
            "video_layout_generation_tpu.losses.vgg",
            fromlist=["VGG19Features"]).VGG19Features(dtype=None),
        vgg_params=load_vgg_params(str(tmp_path / "vgg.npz")))

    hned = HNED()
    x, f3n = prepare_inputs(
        lambda p, im: hned.apply(p, im), hned_params, batch)
    loss_fn = make_loss_fn(model.apply, combined)
    (loss, (metrics, _, _)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params, x, f3n, jnp.asarray(batch["seg3"]))

    # ---- torch recomputation with the same weights
    tp = _torch_params(params)
    with torch.no_grad():
        e1 = _torch_hned_forward(hned_sd, batch["img1"])[-1]
        e2 = _torch_hned_forward(hned_sd, batch["img2"])[-1]

    def nchw(a):
        return torch.from_numpy(np.transpose(a, (0, 3, 1, 2)))

    f1n = (nchw(batch["img1"]) - _IMAGENET_MEAN) / _IMAGENET_STD
    f2n = (nchw(batch["img2"]) - _IMAGENET_MEAN) / _IMAGENET_STD
    f3n_t = (nchw(batch["img3"]) - _IMAGENET_MEAN) / _IMAGENET_STD
    x_t = torch.cat([nchw(e1), nchw(batch["seg1"]), f1n, f2n,
                     nchw(batch["seg2"]), nchw(e2)], dim=1)
    # assembly-order/semantics check; the only sub-5e-4 outliers are HNED
    # sigmoid tails (align_corners=False interpolation diffs amplified by
    # saturated logits of the fake weights) — HNED itself has a tighter
    # dedicated parity test in test_weight_convert.py
    np.testing.assert_allclose(
        np.asarray(x), np.transpose(x_t.numpy(), (0, 2, 3, 1)), atol=5e-3)

    # grads compare on the *identical* assembled input so the edge-channel
    # rounding noise above cannot contaminate the gradient check
    x_t = nchw(np.asarray(x))
    seg_t, img_t = _torch_gridnet(tp, x_t)
    img_n = (img_t - _OUT_MEAN) / _OUT_STD
    loss_l1 = F.l1_loss(img_n, f3n_t) * 40.0
    fo = _torch_vgg_features(vgg_sd, img_n)
    ft = _torch_vgg_features(vgg_sd, f3n_t)
    loss_vgg = (fo - ft.detach()).abs().mean()
    loss_style = (loss_vgg + _torch_gradient_loss(img_n, f3n_t)
                  + _torch_ssim(img_n, f3n_t)) * 20.0
    loss_ce = F.cross_entropy(
        seg_t, torch.from_numpy(batch["seg3"]).long()) * 10.0
    loss_t = loss_l1 + loss_style + loss_ce
    loss_t.backward()

    # loss value and per-term parity
    np.testing.assert_allclose(float(loss), float(loss_t), rtol=2e-4)
    np.testing.assert_allclose(float(metrics["loss_l1"]), float(loss_l1),
                               rtol=2e-4)
    np.testing.assert_allclose(float(metrics["loss_style"]),
                               float(loss_style), rtol=2e-4)
    np.testing.assert_allclose(float(metrics["loss_seg"]), float(loss_ce),
                               rtol=2e-4)

    # every parameter gradient
    flat, _ = jax.tree_util.tree_flatten_with_path(grads["params"])
    assert len(flat) > 100  # the full grid: no silently-skipped leaves
    for path, g in flat:
        keys = [p.key for p in path]
        gt = _torch_grad_leaf(tp, keys)
        g = np.asarray(g)
        scale = max(np.abs(gt).max(), 1e-8)
        # 2e-3 normalized: PReLU alpha grads are scalar sums over ~3e4
        # cancelling terms, where torch-vs-XLA fp32 reassociation alone
        # reaches ~1.5e-3 relative; layout/transpose bugs show up as O(1)
        np.testing.assert_allclose(
            g / scale, gt / scale, atol=2e-3,
            err_msg=f"grad mismatch at {'/'.join(keys)}")

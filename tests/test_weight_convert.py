"""Pretrained-weight conversion: torch state dict -> npz -> flax params,
with numerical parity of the full HNED forward against a torch functional
re-computation using the same weights (SURVEY.md §7 'hard parts')."""

import sys
import os

import numpy as np
import pytest
import torch
import torch.nn.functional as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from convert_torch_weights import convert_hned, convert_vgg19  # noqa: E402

_STAGES = (("VggOne", (3, 64, 64)), ("VggTwo", (64, 128, 128)),
           ("VggThr", (128, 256, 256, 256)), ("VggFou", (256, 512, 512, 512)),
           ("VggFiv", (512, 512, 512, 512)))


def _fake_hned_state_dict(seed=0):
    rng = np.random.default_rng(seed)
    sd = {}
    for si, (name, widths) in enumerate(_STAGES):
        off = 0 if si == 0 else 1
        for j in range(len(widths) - 1):
            c_in, c_out = widths[j], widths[j + 1]
            sd[f"module{name}.{off + 2*j}.weight"] = torch.from_numpy(
                rng.standard_normal((c_out, c_in, 3, 3)).astype(np.float32)
                * 0.05)
            sd[f"module{name}.{off + 2*j}.bias"] = torch.from_numpy(
                rng.standard_normal(c_out).astype(np.float32) * 0.01)
    for i, nm in enumerate(("One", "Two", "Thr", "Fou", "Fiv")):
        c_in = _STAGES[i][1][-1]
        sd[f"moduleScore{nm}.weight"] = torch.from_numpy(
            rng.standard_normal((1, c_in, 1, 1)).astype(np.float32) * 0.05)
        sd[f"moduleScore{nm}.bias"] = torch.zeros(1)
    sd["moduleCombine.0.weight"] = torch.from_numpy(
        rng.standard_normal((1, 5, 1, 1)).astype(np.float32) * 0.2)
    sd["moduleCombine.0.bias"] = torch.zeros(1)
    return sd


def _torch_hned_forward(sd, rgb_nhwc):
    """Functional torch recomputation of HNED semantics (BGR caffe input)."""
    x = torch.from_numpy(np.transpose(rgb_nhwc, (0, 3, 1, 2)))
    h, w = x.shape[2], x.shape[3]
    x = x.flip(1) * 255.0 - torch.tensor(
        [104.00698793, 116.66876762, 122.67891434]).view(1, 3, 1, 1)
    feats = []
    for si, (name, widths) in enumerate(_STAGES):
        if si > 0:
            x = F.max_pool2d(x, 2, 2)
        off = 0 if si == 0 else 1
        for j in range(len(widths) - 1):
            x = F.relu(F.conv2d(x, sd[f"module{name}.{off + 2*j}.weight"],
                                sd[f"module{name}.{off + 2*j}.bias"],
                                padding=1))
        feats.append(x)
    scores = []
    for i, nm in enumerate(("One", "Two", "Thr", "Fou", "Fiv")):
        s = F.conv2d(feats[i], sd[f"moduleScore{nm}.weight"],
                     sd[f"moduleScore{nm}.bias"])
        scores.append(F.interpolate(s, size=(h, w), mode="bilinear",
                                    align_corners=False))
    fuse = torch.sigmoid(F.conv2d(torch.cat(scores, 1),
                                  sd["moduleCombine.0.weight"],
                                  sd["moduleCombine.0.bias"]))
    outs = [torch.sigmoid(s) for s in scores] + [fuse]
    return [np.transpose(o.numpy(), (0, 2, 3, 1)) for o in outs]


def test_hned_conversion_numerical_parity(tmp_path):
    import jax.numpy as jnp

    from video_layout_generation_tpu.io.weights import load_hned_params
    from video_layout_generation_tpu.models import HNED

    sd = _fake_hned_state_dict()
    npz = convert_hned(sd)
    path = tmp_path / "hned.npz"
    np.savez(path, **npz)
    params = load_hned_params(str(path))

    rgb = np.random.default_rng(1).random((1, 32, 32, 3)).astype(np.float32)
    ours = HNED().apply(params, jnp.asarray(rgb))
    with torch.no_grad():
        ref = _torch_hned_forward(sd, rgb)
    for o, r in zip(ours, ref):
        np.testing.assert_allclose(np.asarray(o), r, atol=5e-4)


def test_vgg19_conversion_layout(tmp_path):
    # fabricate a torchvision-like features state dict (conv indices only)
    rng = np.random.default_rng(2)
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25]
    widths = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256),
              (256, 256), (256, 256), (256, 256), (256, 512), (512, 512),
              (512, 512), (512, 512)]
    sd = {}
    for idx, (ci, co) in zip(conv_idx, widths):
        sd[f"features.{idx}.weight"] = torch.from_numpy(
            rng.standard_normal((co, ci, 3, 3)).astype(np.float32) * 0.02)
        sd[f"features.{idx}.bias"] = torch.zeros(co)
    out = convert_vgg19(sd)
    assert len(out) == 24  # 12 kernels + 12 biases
    assert out["conv1_1.kernel"].shape == (3, 3, 3, 64)
    assert out["conv4_4.kernel"].shape == (3, 3, 512, 512)

    # loads into the flax tree and runs
    import jax
    import jax.numpy as jnp

    from video_layout_generation_tpu.losses.vgg import (VGG19Features,
                                                        load_vgg_params)
    path = tmp_path / "vgg.npz"
    np.savez(path, **out)
    params = load_vgg_params(str(path))
    feats = VGG19Features().apply(params, jnp.zeros((1, 32, 32, 3)))
    assert feats.shape == (1, 4, 4, 512)

"""Measure the reference-equivalent rollout throughput on CPU with torch.

The reference publishes no numbers (BASELINE.md), so the quantitative
baseline is *produced*: a functional torch implementation of the reference's
autoregressive rollout workload (bug-fixed semantics — 8-channel input
GridNet, argmax layout feedback, batch 1, fp32, CPU) timed end to end.
Written functionally (param dict + F.conv2d) — this is a measurement rig,
not a model port.

Writes BASELINE_CPU.json: {"frames_per_sec": N, ...}.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import time

import numpy as np
import torch
import torch.nn.functional as F

FILTERS = (32, 64, 96)
N_COL = 6
HW = 256


def _conv_params(rng, c_in, c_out):
    k = torch.from_numpy(
        rng.standard_normal((c_out, c_in, 3, 3)).astype(np.float32) * 0.05)
    b = torch.zeros(c_out)
    a = torch.full((1,), 0.25)
    return [k, b, a]


def _prelu(x, a):
    return torch.where(x >= 0, x, a * x)


def _block(x, p0, p1, stride=1, pre_activate=True, upsample=False):
    """PReLU-conv-PReLU-conv unit used by all three grid block types."""
    if upsample:
        x = F.interpolate(x, scale_factor=2, mode="bilinear",
                          align_corners=True)
    if pre_activate:
        x = _prelu(x, p0[2])
    x = F.conv2d(x, p0[0], p0[1], stride=stride, padding=1)
    x = _prelu(x, p1[2])
    return F.conv2d(x, p1[0], p1[1], padding=1)


def build_params(seed=0, in_ch=8):
    rng = np.random.default_rng(seed)
    f0, f1, f2 = FILTERS
    P = {}
    P["in"] = [_conv_params(rng, in_ch, f0), _conv_params(rng, f0, f0),
               _conv_params(rng, in_ch, f0)]
    P["head_seg"] = [_conv_params(rng, f0, 20), _conv_params(rng, 20, 20)]
    P["head_img"] = [_conv_params(rng, f0, 3), _conv_params(rng, 3, 3)]
    for i in range(N_COL):
        if i < N_COL // 2:
            P[f"d0{i}"] = [_conv_params(rng, f0, f1), _conv_params(rng, f1, f1)]
            P[f"d1{i}"] = [_conv_params(rng, f1, f2), _conv_params(rng, f2, f2)]
        else:
            P[f"u1{i}"] = [_conv_params(rng, f2, f1), _conv_params(rng, f1, f1)]
            P[f"u0{i}"] = [_conv_params(rng, f1, f0), _conv_params(rng, f0, f0)]
        if i >= 1:
            for r, f in enumerate(FILTERS):
                P[f"l{r}{i-1}"] = [_conv_params(rng, f, f),
                                   _conv_params(rng, f, f)]
    return P


def forward(P, x):
    x0 = _block(x, P["in"][0], P["in"][1], pre_activate=False) + \
        F.conv2d(x, P["in"][2][0], P["in"][2][1], padding=1)
    x1 = _block(x0, *P["d00"], stride=2)
    x2 = _block(x1, *P["d10"], stride=2)
    for i in range(1, N_COL):
        if i < N_COL // 2:
            x0 = _block(x0, *P[f"l0{i-1}"])
            x1 = _block(x0, P[f"d0{i}"][0], P[f"d0{i}"][1], stride=2) + \
                _block(x1, *P[f"l1{i-1}"])
            x2 = _block(x1, P[f"d1{i}"][0], P[f"d1{i}"][1], stride=2) + \
                _block(x2, *P[f"l2{i-1}"])
        else:
            x2 = _block(x2, *P[f"l2{i-1}"])
            x1 = _block(x2, P[f"u1{i}"][0], P[f"u1{i}"][1], upsample=True) + \
                _block(x1, *P[f"l1{i-1}"])
            x0 = _block(x1, P[f"u0{i}"][0], P[f"u0{i}"][1], upsample=True) + \
                _block(x0, *P[f"l0{i-1}"])
    seg = _block(x0, *P["head_seg"])
    img = _block(x0, *P["head_img"])
    return seg, img


@torch.no_grad()
def rollout(P, img1, img2, seg1, seg2, n_frames=8):
    imgs, segs = [img1, img2], [seg1, seg2]
    mean = torch.tensor([-0.03, -0.088, -0.188]).view(1, 3, 1, 1)
    std = torch.tensor([0.448, 0.448, 0.450]).view(1, 3, 1, 1)
    for _ in range(n_frames):
        x = torch.cat([segs[-2], imgs[-2], imgs[-1], segs[-1]], dim=1)
        seg_n, img_n = forward(P, x)
        img_n = (img_n - mean) / std
        seg_n = torch.argmax(seg_n, dim=1, keepdim=True).float()
        imgs.append(img_n)
        segs.append(seg_n)
    return imgs, segs


def measure(n_frames=8, batch=1, repeats=3, warmup=1):
    torch.set_num_threads(os.cpu_count() or 1)
    P = build_params()
    rng = np.random.default_rng(1)
    img = torch.from_numpy(rng.random((batch, 3, HW, HW)).astype(np.float32))
    seg = torch.from_numpy(
        rng.integers(0, 20, (batch, 1, HW, HW)).astype(np.float32))
    for _ in range(warmup):
        rollout(P, img, img, seg, seg, n_frames=1)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        rollout(P, img, img, seg, seg, n_frames=n_frames)
        times.append(time.perf_counter() - t0)
    best = min(times)
    fps = batch * n_frames / best
    return {"frames_per_sec": fps, "batch": batch, "n_frames": n_frames,
            "resolution": HW, "seconds_per_rollout": best,
            "threads": torch.get_num_threads(),
            "workload": "8ch GridNet autoregressive rollout, fp32 CPU"}


def measure_train(batch=2, repeats=2, hw=256):
    """Reference-equivalent training step on CPU: GridNet fwd + 3-term loss
    (L1 + VGG-feature/SSIM/gradient-style perceptual stand-in + CE) + bwd +
    Adam. VGG19 runs with random weights (offline env) — throughput is
    weight-independent."""
    import torch.nn as nn
    torch.set_num_threads(os.cpu_count() or 1)
    P = build_params(in_ch=10)
    params = []
    for lst in P.values():
        for grp in lst:
            for t in grp[:2]:
                t.requires_grad_(True)
                params.append(t)
    # VGG19 features through relu4_4 (random weights; offline env —
    # throughput is weight-independent)
    widths = [(3, 64), (64, 64), "M", (64, 128), (128, 128), "M",
              (128, 256), (256, 256), (256, 256), (256, 256), "M",
              (256, 512), (512, 512), (512, 512), (512, 512)]
    layers = []
    for wdt in widths:
        if wdt == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(wdt[0], wdt[1], 3, padding=1), nn.ReLU()]
    vgg = nn.Sequential(*layers).eval()
    opt = torch.optim.Adam(params, lr=2e-4, betas=(0.5, 0.999))
    rng = np.random.default_rng(0)
    x = torch.from_numpy(rng.random((batch, 10, hw, hw)).astype(np.float32))
    f3 = torch.from_numpy(rng.random((batch, 3, hw, hw)).astype(np.float32))
    s3 = torch.from_numpy(rng.integers(0, 20, (batch, hw, hw)))
    ts = []
    for i in range(repeats + 1):
        t0 = time.perf_counter()
        seg, img = forward(P, x)
        loss = 40 * F.l1_loss(img, f3)
        loss = loss + 20 * (vgg(img) - vgg(f3)).abs().mean()
        loss = loss + 10 * F.cross_entropy(seg, s3)
        opt.zero_grad()
        loss.backward()
        opt.step()
        if i:  # skip warmup
            ts.append(time.perf_counter() - t0)
    sec = min(ts)
    return {"train_samples_per_sec": batch / sec, "batch": batch,
            "seconds_per_step": sec}


if __name__ == "__main__":
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == "train":
        print(json.dumps(measure_train()))
        raise SystemExit
    out = measure()
    path = os.path.join(os.path.dirname(__file__), "..", "BASELINE_CPU.json")
    with open(os.path.abspath(path), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))

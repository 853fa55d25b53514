"""In-context cost map of the w2 rollout step via graph ablations.

Isolated component timings repeatedly overestimated in-context costs
(BENCH_NOTES.md), so this measures the FULL 8-frame b128 rollout with parts
of the grid ablated (replaced by shape-correct cheap stand-ins) — the delta
vs the full program is that part's true in-context cost, including the
fusion it participates in.

  python tools/profile_rollout_components.py
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np

BATCH, N_FRAMES, HW = 128, 8, 256


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from video_layout_generation_tpu.models import GridNet
    from video_layout_generation_tpu.models.fast_gridnet import (_down_std,
                                                                 _lateral_std,
                                                                 _up_std)
    from video_layout_generation_tpu.models.fast_gridnet_w2 import (
        _down_from_w2, _lateral_w2, _up_to_w2, pack1x2, unpack1x2)
    from video_layout_generation_tpu.train.assemble import OUT_MEAN, OUT_STD

    model = GridNet(n_channels=8, dtype=jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, HW, HW, 8), jnp.float32))

    n_col = 6

    from video_layout_generation_tpu.models.fast_gridnet import _prelu
    from video_layout_generation_tpu.models.fast_gridnet_w2 import _conv_w2

    def _conv_std(x, w, b, ):
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype)
        return y + b.astype(y.dtype)

    def _up_nearest_noconv_row1(x2):
        # upsample without convs, keeping x2 alive: nearest 2x + ch slice
        return jnp.repeat(jnp.repeat(x2, 2, 1), 2, 2)[..., :64]

    def _up_nearest_noconv_row0(x1):
        # nearest up into w2 space without convs: H-repeat, both W phases
        # equal, slice 96->64 lanes wait x1 is C=64 -> w2 wants 64 lanes
        xh = jnp.repeat(x1, 2, 1)
        return jnp.concatenate([xh, xh], -1)[..., :64]

    def _up_std_nearest(p, x):
        # nearest instead of the bilinear stencil; same convs
        y = jnp.repeat(jnp.repeat(x, 2, 1), 2, 2)
        y = _prelu(y, p["PReLU_0"]["alpha"])
        y = _conv_std(y, p["Conv_0"]["kernel"], p["Conv_0"]["bias"])
        y = _prelu(y, p["PReLU_1"]["alpha"])
        return _conv_std(y, p["Conv_1"]["kernel"], p["Conv_1"]["bias"])

    def _up_w2_nearest(p, x):
        xh = jnp.repeat(x, 2, 1)
        y = jnp.concatenate([xh, xh], -1)  # both w2 phases = nearest in W
        y = _prelu(y, p["PReLU_0"]["alpha"])
        y = _conv_w2(y, p["Conv_0"]["kernel"], p["Conv_0"]["bias"])
        y = _prelu(y, p["PReLU_1"]["alpha"])
        return _conv_w2(y, p["Conv_1"]["kernel"], p["Conv_1"]["bias"])

    def grid_ablated(P, xw, skip=()):
        """_grid_w2 with named parts replaced by cheap stand-ins."""
        x0 = _lateral_w2(P["lateral_in"], xw)
        x1 = _down_from_w2(P["down_00"], x0)
        x2 = _down_std(P["down_10"], x1)
        for i in range(1, n_col):
            C = P[f"col_{i}"]
            if i < n_col / 2:
                if "row0" not in skip:
                    x0 = _lateral_w2(C[f"lateral_0{i-1}"], x0)
                d = (_down_from_w2(C[f"down_0{i}"], x0)
                     if "downs" not in skip else x1)
                x1 = (d + _lateral_std(C[f"lateral_1{i-1}"], x1)
                      if "row1" not in skip else d)
                d2 = (_down_std(C[f"down_1{i}"], x1)
                      if "downs" not in skip else x2)
                x2 = (d2 + _lateral_std(C[f"lateral_2{i-1}"], x2)
                      if "row2" not in skip else d2)
            else:
                if "row2" not in skip:
                    x2 = _lateral_std(C[f"lateral_2{i-1}"], x2)
                if "ups" in skip:
                    # dependency-preserving stand-in (nearest + slice):
                    # keeps x2 alive so nothing upstream is DCE'd
                    u = jnp.repeat(jnp.repeat(x2, 2, 1), 2, 2)[..., :64]
                elif "up_convs" in skip:
                    u = _up_nearest_noconv_row1(x2)
                elif "up_stencil" in skip:
                    u = _up_std_nearest(C[f"up_1{i}"], x2)
                else:
                    u = _up_std(C[f"up_1{i}"], x2)
                x1 = (u + _lateral_std(C[f"lateral_1{i-1}"], x1)
                      if "row1" not in skip else u + x1)
                if "ups" in skip:
                    xh = jnp.repeat(x1, 2, 1)
                    r = jnp.concatenate([xh, xh], -1)[..., :64]
                elif "up_convs" in skip:
                    r = _up_nearest_noconv_row0(x1)
                elif "up_stencil" in skip:
                    r = _up_w2_nearest(C[f"up_0{i}"], x1)
                else:
                    r = _up_to_w2(C[f"up_0{i}"], x1)
                if "row0" not in skip:
                    x0 = _lateral_w2(C[f"lateral_0{i-1}"], x0, residual=r)
                else:
                    x0 = x0 + r
        if "heads" in skip:
            segp = jnp.concatenate([x0[..., :20], x0[..., 32:52]], axis=-1)
            imgp = jnp.concatenate([x0[..., :3], x0[..., 32:35]], axis=-1)
        else:
            segp = _lateral_w2(P["lateral_out_seg"], x0)
            imgp = _lateral_w2(P["lateral_out_img"], x0)
        return segp, imgp

    def make_rollout(skip=()):
        mean = jnp.tile(jnp.asarray(OUT_MEAN, jnp.float32), 2)
        std = jnp.tile(jnp.asarray(OUT_STD, jnp.float32), 2)

        def rollout(variables, img1, img2, seg1, seg2):
            P = variables["params"]
            dt = jnp.bfloat16
            n, h, w, _ = img1.shape

            def to_p(x):
                return pack1x2(x.astype(dt))

            def step(carry, _):
                f_old, f_new, s_old, s_new = carry
                b, hh, ww, _ = f_old.shape
                parts = (s_old.reshape(b, hh, ww, 2, 1),
                         f_old.reshape(b, hh, ww, 2, 3),
                         f_new.reshape(b, hh, ww, 2, 3),
                         s_new.reshape(b, hh, ww, 2, 1))
                xw = jnp.concatenate(parts, axis=-1).reshape(b, hh, ww, 16)
                segp, imgp = grid_ablated(P, xw, skip)
                imgp = ((imgp.astype(jnp.float32) - mean) / std).astype(dt)
                seg_out = segp.shape[-1] // 2
                ids = jnp.argmax(
                    segp.reshape(b, hh, ww, 2, seg_out).astype(jnp.float32),
                    axis=-1)
                segp_next = ids.reshape(b, hh, ww, 2).astype(dt)
                return (f_new, imgp, s_new, segp_next), (imgp, segp_next)

            carry0 = (to_p(img1), to_p(img2), to_p(seg1), to_p(seg2))
            _, (imgs_p, segs_p) = jax.lax.scan(step, carry0, None,
                                               length=N_FRAMES)
            return imgs_p.sum(), segs_p.astype(jnp.float32).sum()

        return jax.jit(rollout)

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((BATCH, HW, HW, 3), np.float32))
    seg = jnp.asarray(
        rng.integers(0, 20, (BATCH, HW, HW, 1)).astype(np.float32))

    one = jnp.ones(())
    for _ in range(2):
        float((one + 1).sum())
    t0 = time.time()
    for _ in range(5):
        float((one + 1).sum())
    rtt = (time.time() - t0) / 5
    print(f"rtt {rtt*1000:.1f} ms", flush=True)

    results = {}
    for tag, skip in [
        ("full", ()),
        ("no_ups", ("ups",)),           # nearest+slice stand-in, deps kept
        ("no_up_convs", ("up_convs",)),  # up convs removed, stencil kept
        ("no_up_stencil", ("up_stencil",)),  # nearest replaces bilinear
    ]:
        fn = make_rollout(skip)
        tic = time.time()
        out = fn(params, img, img, seg, seg)
        float(out[0])
        compile_s = time.time() - tic
        times = []
        for _ in range(4):
            tic = time.time()
            float(fn(params, img, img, seg, seg)[0])
            times.append(time.time() - tic)
        dt = min(times) - rtt
        results[tag] = dt
        print(f"{tag}: {dt*1000:.1f} ms (compile {compile_s:.0f}s)",
              flush=True)

    full = results["full"]
    for tag, dt in results.items():
        if tag != "full":
            print(f"in-context cost of {tag[3:] if tag.startswith('no_') else tag}: "
                  f"{(full - dt)*1000:.1f} ms "
                  f"({100*(full-dt)/full:.1f}%)", flush=True)


if __name__ == "__main__":
    main()

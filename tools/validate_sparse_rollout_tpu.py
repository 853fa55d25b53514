"""Model-level on-chip check: packed GridNet rollout, sparse vs dense.

Builds the bench workload (GridNet 32/64/96, 8-frame packed rollout,
256px), traces it twice — VLG_PACKED_SPARSE on and off (the dispatch reads
the env at trace time) — and reports output deltas and per-rollout time.

  python tools/validate_sparse_rollout_tpu.py > /tmp/sparse_rollout.log 2>&1
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import time

import numpy as np

BATCH = 128
HW = 256


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from video_layout_generation_tpu.models.fast_gridnet import (
        make_packed_rollout_fn)
    from video_layout_generation_tpu.models.gridnet import GridNet

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    # staged precheck: fused kernels at a tiny shape (seconds to compile)
    # so kernel regressions fail fast instead of inside the big scan program
    from video_layout_generation_tpu.ops.packed import (conv_packed3x3_dense,
                                                        pack2x2,
                                                        pack_kernel3x3)
    from video_layout_generation_tpu.ops.pallas.conv_packed import (
        prelu_conv_packed3x3, prelu_conv_packed3x3_res)
    xs = pack2x2(jnp.asarray(
        rng.standard_normal((2, 32, 32, 32)).astype(np.float32),
        dtype=jnp.bfloat16))
    ws = pack_kernel3x3(jnp.asarray(
        rng.standard_normal((3, 3, 32, 32)).astype(np.float32) * 0.05,
        dtype=jnp.bfloat16))
    bs = jnp.asarray(rng.standard_normal(32).astype(np.float32))
    al = jnp.asarray(0.25, jnp.float32)
    rs = jnp.asarray(rng.standard_normal(
        (2, 16, 16, 128)).astype(np.float32), dtype=jnp.bfloat16)
    got = np.asarray(jax.jit(
        lambda *a: prelu_conv_packed3x3_res(*a, 8))(xs, ws, bs, al, rs),
        np.float32)
    pre = jnp.where(xs.astype(jnp.float32) >= 0, xs,
                    al.astype(xs.dtype) * xs)
    ref = np.asarray(jax.jit(conv_packed3x3_dense)(pre.astype(xs.dtype),
                                                   ws, bs) + rs, np.float32)
    d = np.abs(got - ref).max()
    print(f"fused precheck bf16 max abs diff: {d:.4f}", flush=True)
    assert d < 0.3, "fused kernel numerics mismatch"
    _ = np.asarray(jax.jit(
        lambda *a: prelu_conv_packed3x3(*a, 8))(xs, ws, bs, al))
    print("fused prechecks ok", flush=True)

    model = GridNet(n_channels=8, dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, HW, HW, 8), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0)

    img1, img2 = (jnp.asarray(rng.standard_normal(
        (BATCH, HW, HW, 3)).astype(np.float32)) for _ in range(2))
    seg1, seg2 = (jnp.asarray(rng.integers(
        0, 20, (BATCH, HW, HW, 1)).astype(np.float32)) for _ in range(2))

    outs = {}
    times = {}
    for mode, env in (("dense", "0"), ("sparse", "1")):
        os.environ["VLG_PACKED_SPARSE"] = env
        fn = make_packed_rollout_fn(n_frames=8, packing="2x2")
        t0 = time.perf_counter()
        imgs, segs = fn(variables, img1, img2, seg1, seg2)
        s = float(imgs.astype(jnp.float32).sum()
                  + segs.astype(jnp.float32).sum())
        print(f"{mode}: compile+first {time.perf_counter()-t0:.1f}s "
              f"(checksum {s:.1f})", flush=True)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            imgs, segs = fn(variables, img1, img2, seg1, seg2)
            float(imgs.astype(jnp.float32).sum())
            ts.append(time.perf_counter() - t0)
        times[mode] = min(ts) - 0.027
        outs[mode] = (np.asarray(imgs, np.float32), np.asarray(segs))
        fps = BATCH * 8 / times[mode]
        print(f"{mode}: {times[mode]*1e3:.1f} ms/rollout  {fps:.1f} fps",
              flush=True)

    di = np.abs(outs["sparse"][0] - outs["dense"][0])
    seg_mismatch = (outs["sparse"][1] != outs["dense"][1]).mean()
    print(f"img |diff|: max {di.max():.4f} mean {di.mean():.6f}", flush=True)
    print(f"seg id mismatch frac: {seg_mismatch:.6f}", flush=True)
    print(f"speedup: {times['dense']/times['sparse']:.3f}x", flush=True)
    print("ALL DONE", flush=True)


if __name__ == "__main__":
    main()

"""On-chip validation + bench of BOTH sparse packed-conv kernels.

Covers the 2x2 kernel (ops/pallas/conv_packed.py, rollout row 0) and the
1x2 kernel (ops/pallas/conv1x2.py, row 1 / HNED-VGG stage-1 shapes):
numerics in fp32 through the real Mosaic lowering, then steady-state perf
vs the XLA formulations at the production shapes.

Prints incrementally (run with output redirected to a file, NOT through
tail). NO hard-exit watchdog — killing a process mid-TPU-RPC wedges the
remote server (see CLAUDE.md); bound the workload, not the process.

  python tools/validate_sparse_convs_tpu.py > /tmp/sparse_val.log 2>&1
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np

ITERS = 30


def _timeit(f, *args):
    """compile + 3 steady-state runs; returns min seconds (27ms RTT
    subtracted by the caller where relevant)."""
    t0 = time.perf_counter()
    float(f(*args))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    return compile_s, min(ts)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from video_layout_generation_tpu.ops.packed import (
        conv_packed1x2_dense, conv_packed3x3_dense, pack1x2, pack2x2,
        pack_kernel3x3, pack_kernel3x3_1x2, unpack1x2)
    from video_layout_generation_tpu.ops.pallas.conv1x2 import conv3x3_w1x2
    from video_layout_generation_tpu.ops.pallas.conv_packed import (
        conv_packed3x3_sparse)

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    def conv_std(x, k, b):
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype)
        return y + b.astype(y.dtype)

    # ---------- numerics, fp32, real Mosaic lowering ----------
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 32)).astype(np.float32))
    wl = jnp.asarray(
        rng.standard_normal((3, 3, 32, 32)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.standard_normal(32).astype(np.float32))
    got = np.asarray(jax.jit(lambda *a: conv_packed3x3_sparse(*a, 16))(
        pack2x2(x), pack_kernel3x3(wl), b))
    ref = np.asarray(jax.jit(conv_packed3x3_dense)(
        pack2x2(x), pack_kernel3x3(wl), b))
    d = np.abs(got - ref).max()
    print(f"2x2 sparse fp32 max abs diff: {d:.3e}", flush=True)
    assert d < 1e-2

    x = jnp.asarray(rng.standard_normal((2, 32, 64, 64)).astype(np.float32))
    wl = jnp.asarray(
        rng.standard_normal((3, 3, 64, 64)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.standard_normal(64).astype(np.float32))
    got = np.asarray(jax.jit(lambda *a: conv3x3_w1x2(*a, 16))(x, wl, b))
    ref = np.asarray(jax.jit(conv_std)(x, wl, b))
    d = np.abs(got - ref).max()
    print(f"1x2 sparse fp32 max abs diff: {d:.3e}", flush=True)
    assert d < 1e-2

    # ---------- perf ----------
    def bench_pair(tag, mk_x, mk_w, mk_b, fns, fl_logical):
        xs, ws, bs = mk_x(), mk_w(), mk_b()
        times = {}
        for name, fn in fns.items():
            def body(xb, kb, bb, fn=fn):
                def step(acc, _):
                    return fn(acc, kb, bb), None
                y, _ = jax.lax.scan(step, xb, None, length=ITERS)
                return y.astype(jnp.float32).sum()
            cs, best = _timeit(jax.jit(body), xs, ws, bs)
            per = (best - 0.027) / ITERS
            times[name] = per
            print(f"{tag} {name:28s} compile {cs:5.1f}s  {per*1e3:7.3f} "
                  f"ms/conv  {fl_logical/per/1e12:6.1f} logical TF/s",
                  flush=True)
        return times

    B = 128
    import functools

    # -- row0 (2x2-packed, batch 128): packed (128,128,128,128) --
    c = 32
    fl = 2 * B * 256 * 256 * 9 * c * c
    t = bench_pair(
        "row0",
        lambda: jnp.asarray(rng.standard_normal(
            (B, 128, 128, 4 * c)).astype(np.float32), dtype=jnp.bfloat16),
        lambda: pack_kernel3x3(jnp.asarray(rng.standard_normal(
            (3, 3, c, c)).astype(np.float32) * 0.05, dtype=jnp.bfloat16)),
        lambda: jnp.asarray(np.zeros(c, np.float32)),
        {"xla dense packed": conv_packed3x3_dense,
         "sparse th=8": functools.partial(conv_packed3x3_sparse, tile_h=8),
         "sparse th=16": functools.partial(conv_packed3x3_sparse, tile_h=16),
         "sparse th=32": functools.partial(conv_packed3x3_sparse, tile_h=32)},
        fl)
    base = t["xla dense packed"]
    for k, v in t.items():
        if k != "xla dense packed":
            print(f"  row0 {k}: {base/v:.3f}x vs xla", flush=True)

    # -- row1 (standard C=64 @128px, batch 128) --
    c = 64
    fl = 2 * B * 128 * 128 * 9 * c * c

    def w1x2_as_std(x, k, b, tile_h):
        return conv3x3_w1x2(x, k, b, tile_h)

    t = bench_pair(
        "row1",
        lambda: jnp.asarray(rng.standard_normal(
            (B, 128, 128, c)).astype(np.float32), dtype=jnp.bfloat16),
        lambda: jnp.asarray(rng.standard_normal(
            (3, 3, c, c)).astype(np.float32) * 0.05, dtype=jnp.bfloat16),
        lambda: jnp.asarray(np.zeros(c, np.float32)),
        {"xla std C64": conv_std,
         "1x2 sparse th=16": functools.partial(w1x2_as_std, tile_h=16),
         "1x2 sparse th=32": functools.partial(w1x2_as_std, tile_h=32),
         "1x2 sparse th=64": functools.partial(w1x2_as_std, tile_h=64)},
        fl)
    base = t["xla std C64"]
    for k, v in t.items():
        if k != "xla std C64":
            print(f"  row1 {k}: {base/v:.3f}x vs xla", flush=True)

    # -- HNED/VGG stage-1 shape (C=64 @256px, train batch 16) --
    Bt = 16
    fl = 2 * Bt * 256 * 256 * 9 * c * c
    t = bench_pair(
        "hned-s1",
        lambda: jnp.asarray(rng.standard_normal(
            (Bt, 256, 256, c)).astype(np.float32), dtype=jnp.bfloat16),
        lambda: jnp.asarray(rng.standard_normal(
            (3, 3, c, c)).astype(np.float32) * 0.05, dtype=jnp.bfloat16),
        lambda: jnp.asarray(np.zeros(c, np.float32)),
        {"xla std C64": conv_std,
         "1x2 sparse th=32": functools.partial(w1x2_as_std, tile_h=32)},
        fl)
    base = t["xla std C64"]
    print(f"  hned-s1 1x2 sparse: "
          f"{base/t['1x2 sparse th=32']:.3f}x vs xla", flush=True)

    print("ALL DONE", flush=True)


if __name__ == "__main__":
    main()

"""Validate + bench the sparse packed-conv Pallas kernel on the real chip.

1) numerics: fp32 sparse kernel vs dense XLA packed conv (max abs diff)
2) perf at the rollout row-0 shape (batch 128, packed 128x128, 4C=128):
   dense XLA packed conv vs sparse kernel at several tile heights.

  timeout 580 python tools/validate_conv_packed_tpu.py
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np

ITERS = 30


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from video_layout_generation_tpu.ops.packed import (
        conv_packed3x3_dense, pack2x2, pack_kernel3x3)
    from video_layout_generation_tpu.ops.pallas.conv_packed import (
        conv_packed3x3_sparse)

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    # -- numerics (fp32, real Mosaic lowering) --
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 32)).astype(np.float32))
    wl = jnp.asarray(
        rng.standard_normal((3, 3, 32, 32)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.standard_normal(32).astype(np.float32))
    xp = pack2x2(x)
    wp = pack_kernel3x3(wl)
    got = np.asarray(jax.jit(
        lambda *a: conv_packed3x3_sparse(*a, 16))(xp, wp, b))
    ref = np.asarray(jax.jit(conv_packed3x3_dense)(xp, wp, b))
    diff = np.abs(got - ref).max()
    print(f"fp32 max abs diff: {diff:.3e} (ref scale {np.abs(ref).max():.2f})",
          flush=True)
    assert diff < 1e-2, "numerics mismatch"

    # -- perf at the packed row-0 rollout shape --
    n, hp, wpx, c = 128, 128, 128, 32   # packed: (128, 128, 128, 128)
    xb = jnp.asarray(
        rng.standard_normal((n, hp, wpx, 4 * c)).astype(np.float32),
        dtype=jnp.bfloat16)
    kb = pack_kernel3x3(jnp.asarray(
        rng.standard_normal((3, 3, c, c)).astype(np.float32) * 0.05,
        dtype=jnp.bfloat16))
    bb = jnp.asarray(np.zeros(c, np.float32))
    # useful (logical) FLOPs of the conv
    fl_logical = 2 * n * (2 * hp) * (2 * wpx) * 9 * c * c

    def bench(fn, name):
        def body(xb, kb, bb):
            def step(acc, _):
                return fn(acc, kb, bb), None
            y, _ = jax.lax.scan(step, xb, None, length=ITERS)
            return y.astype(jnp.float32).sum()

        f = jax.jit(body)
        t0 = time.perf_counter()
        float(f(xb, kb, bb))
        print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s",
              flush=True)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(xb, kb, bb))
            ts.append(time.perf_counter() - t0)
        per = (min(ts) - 0.027) / ITERS
        print(f"{name}: {per*1e3:8.3f} ms/conv  "
              f"{fl_logical/per/1e12:7.1f} logical TF/s", flush=True)
        return per

    t_xla = bench(conv_packed3x3_dense, "xla dense packed")
    for th in (8, 16, 32):
        t_p = bench(functools_partial(conv_packed3x3_sparse, tile_h=th),
                    f"pallas sparse th={th}")
        print(f"  speedup vs xla: {t_xla / t_p:.3f}x", flush=True)


def functools_partial(fn, **kw):
    import functools
    return functools.partial(fn, **kw)


if __name__ == "__main__":
    import threading

    def _watchdog():
        # warn-only: hard-exiting a process blocked in a TPU RPC wedges the
        # remote server for hours (see CLAUDE.md) — never _os._exit here
        time.sleep(560)
        print("WATCHDOG: still running after 560s (letting it finish)",
              flush=True)

    threading.Thread(target=_watchdog, daemon=True).start()
    main()

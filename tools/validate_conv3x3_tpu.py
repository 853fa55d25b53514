"""Validate + bench the Pallas conv3x3 kernel on the real chip.

1) numerics: fp32 Pallas vs XLA conv on a small tensor (max abs diff)
2) perf: bf16 packed row-0 rollout shape (batch 128, 128x128, C128->128),
   Pallas vs XLA, ITERS chained inside one jit (amortizes tunnel RTT).

  timeout 580 python tools/validate_conv3x3_tpu.py
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

    from video_layout_generation_tpu.ops.pallas.conv3x3 import (
        _xla_conv3x3, conv3x3_pallas)

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    # -- numerics (fp32, real Mosaic lowering) --
    x = jnp.asarray(rng.standard_normal((2, 32, 128, 128)).astype(np.float32))
    k = jnp.asarray(
        rng.standard_normal((3, 3, 128, 128)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.standard_normal(128).astype(np.float32))
    got = np.asarray(jax.jit(lambda *a: conv3x3_pallas(*a, 16))(x, k, b))
    ref = np.asarray(jax.jit(_xla_conv3x3)(x, k, b))
    diff = np.abs(got - ref).max()
    print(f"fp32 max abs diff: {diff:.3e} (ref scale {np.abs(ref).max():.2f})",
          flush=True)
    assert diff < 1e-2, "numerics mismatch"

    # -- perf on the rollout shape --
    def bench(fn, name, n=128, h=128, w=128, c=128, tile_h=None):
        xb = jnp.asarray(rng.standard_normal((n, h, w, c)).astype(np.float32),
                         dtype=jnp.bfloat16)
        kb = jnp.asarray(
            rng.standard_normal((3, 3, c, c)).astype(np.float32) * 0.05,
            dtype=jnp.bfloat16)
        bb = jnp.asarray(np.zeros(c, np.float32))

        def body(xb, kb, bb):
            def step(acc, _):
                y = (fn(acc, kb, bb, tile_h) if tile_h is not None
                     else fn(acc, kb, bb))
                return y, None
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
        fl = 2 * n * h * w * 9 * c * c
        print(f"{name}: {per*1e3:8.3f} ms/conv  {fl/per/1e12:7.1f} TF/s",
              flush=True)
        return per

    t_xla = bench(_xla_conv3x3, "xla  row0-packed")
    for th in (8, 16, 32):
        t_p = bench(conv3x3_pallas, f"pallas tile_h={th}", tile_h=th)
        print(f"  speedup vs xla: {t_xla / t_p:.3f}x", flush=True)


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

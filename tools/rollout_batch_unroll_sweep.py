"""Rollout A/B sweep: batch size x scan unroll on the real TPU.

Two cheap exact-path questions left open by the round-2 cost maps:

1. Has the throughput plateau moved past batch 128? The b16->b256 sweep
   that picked 128 predates the packed executors (551->941 fps since);
   re-measure 128/192/256 on the current 1x2 path.
2. Does unrolling the 8-step ``lax.scan`` help? Full unroll turns the
   rollout into straight-line code, letting XLA fuse each step's
   argmax/affine epilogue into the next step's input assembly (the carry
   round-trips ~134 MB of HBM per step at b128).

Usage:  timeout 3000 python tools/rollout_batch_unroll_sweep.py
One compile session; best-of-3 steady-state timings; scalar-fetch sync
(block_until_ready is a no-op on the tunneled platform).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

N_FRAMES = 8
HW = 256

# (batch, packing, unroll) combos; b128/u1/1x2 is the current bench point.
CONFIGS = [
    (128, "1x2", 1),
    (128, "1x2", 2),
    (192, "1x2", 1),
    (256, "1x2", 1),
    (256, "2x2", 1),
    (128, "1x2", 8),   # last: the full-unroll program is ~8x to compile
]


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from video_layout_generation_tpu.models import GridNet
    from video_layout_generation_tpu.models.fast_gridnet import (
        make_packed_rollout_fn)

    model = GridNet(n_channels=8, dtype=jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, HW, HW, 8), jnp.float32))

    rng = np.random.default_rng(0)
    results = []
    for batch, packing, unroll in CONFIGS:
        ro = make_packed_rollout_fn(n_frames=N_FRAMES, dtype=jnp.bfloat16,
                                    jit=False, packing=packing,
                                    unroll=unroll)
        fn = jax.jit(lambda p, a, b, c, d, _ro=ro: jax.tree_util.tree_map(
            lambda t: t.sum(), _ro(p, a, b, c, d)),
            compiler_options={"xla_tpu_scoped_vmem_limit_kib": "98304"})
        img = jnp.asarray(rng.random((batch, HW, HW, 3), np.float32))
        seg = jnp.asarray(
            rng.integers(0, 20, (batch, HW, HW, 1)).astype(np.float32))
        t0 = time.time()
        try:
            float(fn(params, img, img, seg, seg)[0])  # compile + warmup
        except Exception as e:  # OOM at large batch is a result, not a crash
            print(json.dumps({"batch": batch, "packing": packing,
                              "unroll": unroll,
                              "error": type(e).__name__}), flush=True)
            continue
        compile_s = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(params, img, img, seg, seg)[0])
            times.append(time.perf_counter() - t0)
        best = min(times)
        fps = batch * N_FRAMES / best
        rec = {"batch": batch, "packing": packing, "unroll": unroll,
               "ms_per_rollout": round(best * 1000, 1),
               "fps": round(fps, 1), "compile_s": round(compile_s, 1)}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    print(json.dumps({"sweep": results}))


if __name__ == "__main__":
    main()

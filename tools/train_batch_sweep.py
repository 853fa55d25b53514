"""Train-step batch sweep: samples/s at b8..b64 on the production step.

The rollout's throughput plateau moved from b128 to b256 once measured
(tools/rollout_batch_unroll_sweep.py); the TRAIN step has only ever been
timed at the reference's b16 (reference trains at batch 16/GPU,
/root/reference/src/main.py). This sweeps the full fwd+bwd+Adam program
(256px, HNED edges, bf16, packed 2x2 training forward) across batch to
find the per-chip training-throughput operating point, plus a 1x2 check
at the winning batch (the 2x2-for-training choice was measured at b16
only: 135 vs 153 ms/step).

  python tools/train_batch_sweep.py
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import numpy as np

HW = 256
BATCHES = (8, 16, 32, 64)


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from video_layout_generation_tpu.losses.combined import CombinedLoss
    from video_layout_generation_tpu.models import HNED, GridNet
    from video_layout_generation_tpu.models.fast_gridnet import (
        make_packed_gridnet_apply)
    from video_layout_generation_tpu.train.state import (TrainState,
                                                         make_optimizer)
    from video_layout_generation_tpu.train.steps import make_train_step

    dt = jnp.bfloat16
    model = GridNet(n_channels=10, dtype=dt)
    hned = HNED(dtype=dt)
    combined = CombinedLoss.create(dtype=dt, image_hw=(HW, HW))
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, HW, HW, 10), jnp.float32))
    hned_params = jax.jit(hned.init)(jax.random.key(1),
                                     jnp.zeros((1, HW, HW, 3), jnp.float32))
    state0 = TrainState.create(params, make_optimizer("adam", 2e-4, 0.5))
    key = jax.random.key(2)

    one = jnp.ones(())
    for _ in range(2):
        float((one + 1).sum())
    t0 = time.time()
    for _ in range(5):
        float((one + 1).sum())
    rtt = (time.time() - t0) / 5
    print(f"rtt {rtt*1000:.1f} ms", flush=True)

    rng = np.random.default_rng(0)

    def make_batch(b):
        return {
            "img1": jnp.asarray(rng.random((b, HW, HW, 3), np.float32)),
            "img2": jnp.asarray(rng.random((b, HW, HW, 3), np.float32)),
            "img3": jnp.asarray(rng.random((b, HW, HW, 3), np.float32)),
            "seg1": jnp.asarray(
                rng.integers(0, 20, (b, HW, HW, 1)).astype(np.float32)),
            "seg2": jnp.asarray(
                rng.integers(0, 20, (b, HW, HW, 1)).astype(np.float32)),
            "seg3": jnp.asarray(
                rng.integers(0, 20, (b, HW, HW)).astype(np.int32)),
        }

    results = []

    def run_point(b, packing):
        apply = make_packed_gridnet_apply(dtype=dt, coord_in=False,
                                          packing=packing)
        step = make_train_step(apply, hned.apply, combined, donate=False)
        batch = make_batch(b)
        try:
            tic = time.time()
            state, metrics = step(state0, hned_params, batch, key)
            float(metrics["loss"])
            compile_s = time.time() - tic
            ts = []
            for _ in range(5):
                tic = time.time()
                state, metrics = step(state0, hned_params, batch, key)
                float(metrics["loss"])
                ts.append(time.time() - tic)
            ms = (min(ts) - rtt) * 1000
            rec = {"batch": b, "packing": packing,
                   "ms_per_step": round(ms, 1),
                   "samples_per_s": round(b / (ms / 1000), 1),
                   "compile_s": round(compile_s, 1)}
        except Exception as e:  # OOM etc. — record and continue
            rec = {"batch": b, "packing": packing,
                   "error": type(e).__name__}
        print(json.dumps(rec), flush=True)
        results.append(rec)
        return rec

    for b in BATCHES:
        run_point(b, "2x2")
    ok = [r for r in results if "error" not in r]
    if ok:
        best = max(ok, key=lambda r: r["samples_per_s"])
        if best["batch"] != 16:
            run_point(best["batch"], "1x2")
    print(json.dumps({"sweep": results}), flush=True)


if __name__ == "__main__":
    main()

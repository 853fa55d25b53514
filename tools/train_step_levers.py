"""VERDICT r2 #3a: attack the train step's 48% backward+Adam slice with
the named levers, measured as same-process full-program A/Bs on the real
TPU (production shape: 256px, b16, HNED edges, bf16, packed training fwd).

Levers:
  baseline        packed fwd, no remat, donate=False, fp32 Adam moments
  donate          donate the TrainState (buffer reuse for params+moments)
  mu_bf16         Adam first moment stored bf16 (train/state.py)
  donate+mu_bf16  both
  remat_columns   standard flax apply with per-column jax.checkpoint
                  (packed fwd unavailable under remat) vs
  std_noremat     standard flax apply, no remat (isolates packed-fwd gain)
  b32 / b64       batch scaling at the baseline config (samples/s/chip —
                  is b16 the right operating point?)

  python tools/train_step_levers.py [--skip b64]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np

HW = 256


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", nargs="*", default=[])
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

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
    model_remat = GridNet(n_channels=10, dtype=dt, remat=True)
    hned = HNED(dtype=dt)
    combined = CombinedLoss.create(dtype=dt, image_hw=(HW, HW))
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, HW, HW, 10), jnp.float32))
    hned_params = jax.jit(hned.init)(jax.random.key(1),
                                     jnp.zeros((1, HW, HW, 3), jnp.float32))
    packed_apply = make_packed_gridnet_apply(dtype=dt, coord_in=False)

    def batch_of(b):
        rng = np.random.default_rng(0)
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

    key = jax.random.key(2)
    one = jnp.ones(())

    def rtt():
        for _ in range(2):
            float((one + 1).sum())
        t0 = time.time()
        for _ in range(5):
            float((one + 1).sum())
        return (time.time() - t0) / 5

    def state_of(mu_bf16=False):
        mu = jnp.bfloat16 if mu_bf16 else None
        # fresh param buffers per lever: the donate levers donate the whole
        # TrainState, which would delete the shared `params` arrays and
        # crash every subsequent lever ("Array has been deleted")
        p = jax.tree_util.tree_map(jnp.copy, params)
        return TrainState.create(
            p, make_optimizer("adam", 2e-4, 0.5, moment_dtype=mu))

    results = {}

    def measure(tag, apply_fn, b=16, donate=False, mu_bf16=False):
        if tag in args.skip:
            return
        step = make_train_step(apply_fn, hned.apply, combined,
                               donate=donate)
        batch = batch_of(b)
        st = state_of(mu_bf16)
        tic = time.time()
        st2, metrics = step(st, hned_params, batch, key)
        loss0 = float(metrics["loss"])
        print(f"{tag}: compile+first {time.time()-tic:.1f}s "
              f"loss {loss0:.3f}", flush=True)
        r = rtt()
        ts = []
        st_run = st2 if donate else st
        for _ in range(args.repeats):
            tic = time.time()
            st_run, metrics = step(st_run, hned_params, batch, key)
            float(metrics["loss"])
            ts.append(time.time() - tic)
        dtm = min(ts) - r
        results[tag] = {"ms_per_step": round(dtm * 1000, 1),
                        "samples_per_s": round(b / dtm, 1),
                        "rtt_ms": round(r * 1000, 1), "loss": loss0}
        print(f"{tag}: {dtm*1000:.1f} ms/step -> {b/dtm:.1f} samples/s "
              f"(rtt {r*1000:.0f} ms)", flush=True)

    measure("baseline", packed_apply)
    measure("donate", packed_apply, donate=True)
    measure("mu_bf16", packed_apply, mu_bf16=True)
    measure("donate+mu_bf16", packed_apply, donate=True, mu_bf16=True)
    measure("std_noremat", model.apply)
    measure("remat_columns", model_remat.apply)
    measure("b32", packed_apply, b=32)
    measure("b64", packed_apply, b=64)

    print(json.dumps(results))


if __name__ == "__main__":
    main()

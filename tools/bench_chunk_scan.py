"""Chunked host-fed dispatch (train/chunk_scan.py) wall-clock A/B on the
real TPU — VERDICT r2 #2: host-fed training wall/step at chunk K vs the
per-step path vs the pure device step time.

Same-process controlled A/B (tunnel weather makes cross-run host-path
comparisons meaningless — CLAUDE.md): one Trainer per executor, identical
production config (256px b16 bf16 packed fwd, host-fed synthetic data,
packed uint8 single-array transfer), timed over full epochs in one
process, plus the bare device step (pre-staged batch, RTT-corrected) as
the floor.

  python tools/bench_chunk_scan.py [--k 8] [--epochs 2]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--bs", type=int, default=16)
    ap.add_argument("--train_size", type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from video_layout_generation_tpu.config import Config
    from video_layout_generation_tpu.train import Trainer

    def cfg_of(chunk):
        return Config(dataset="synthetic", synthetic_train_size=args.train_size,
                      synthetic_val_size=32,
                      image_size=(args.size, args.size), batch_size=args.bs,
                      epochs=args.epochs, edge=True, arch="GridNet",
                      compute_dtype="bfloat16", workers=4, print_freq=1000,
                      path=None, mesh_shape=(1,), rollout_frames=2,
                      chunk_steps=chunk)

    results = {}
    steps_per_epoch = args.train_size // args.bs

    def run(tag, chunk):
        t = Trainer(cfg_of(chunk))
        # epoch 0: compile + warm (not timed)
        t.set_epoch(0)
        t.train()
        ts = []
        for e in range(1, args.epochs + 1):
            t.set_epoch(e)
            t0 = time.time()
            t.train()
            ts.append(time.time() - t0)
        wall = min(ts) / steps_per_epoch
        results[tag] = round(wall * 1000, 1)
        print(f"{tag}: {wall*1000:.1f} ms/step wall "
              f"({steps_per_epoch} steps/epoch, best of {len(ts)})",
              flush=True)
        return t

    t_per = run("per_step_ms", 0)
    run(f"chunk{args.k}_ms", args.k)

    # device-step floor: pre-staged batch, same process, RTT-corrected
    batch = next(iter(t_per.train_loader))
    one = jnp.ones(())
    for _ in range(2):
        float((one + 1).sum())
    t0 = time.time()
    for _ in range(5):
        float((one + 1).sum())
    rtt = (time.time() - t0) / 5
    st, key = t_per.state, jax.random.key(0)
    st, m = t_per._train_step(st, t_per.hned_params, batch, key)  # warm
    float(m["loss"])
    ts = []
    for _ in range(4):
        t0 = time.time()
        st, m = t_per._train_step(st, t_per.hned_params, batch, key)
        float(m["loss"])
        ts.append(time.time() - t0)
    results["device_step_ms"] = round((min(ts) - rtt) * 1000, 1)
    results["rtt_ms"] = round(rtt * 1000, 1)
    results["chunk_vs_device_ratio"] = round(
        results[f"chunk{args.k}_ms"] / results["device_step_ms"], 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

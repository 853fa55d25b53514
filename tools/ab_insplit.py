"""Full-program hardware A/B of the input-phase-split packed convs
(VLG_PACKED_INSPLIT; ops/packed.pack_kernel3x3_insplit) against the dense
packed forms, on the bench workloads:

  rollout: b256 (bench operating point, row-0 packing auto->1x2) and b16
           (2x2 mid-batch regime), exact path, vmem96 like bench.py
  train:   b16 256px packed-fwd step (the insplit VJP is 4 transposed
           convs -- may differ from the dense VJP)

The env flag is read at TRACE time, so each variant builds fresh jitted
programs in one process (same-process controlled A/B per CLAUDE.md tunnel
discipline).

  python tools/ab_insplit.py [--skip train b16]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import time

import numpy as np

HW = 256
N_FRAMES = 8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", nargs="*", default=[])
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--modes", nargs="*", default=["0", "1", "concat"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from video_layout_generation_tpu.models import GridNet

    model = GridNet(n_channels=8, dtype=jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, HW, HW, 8), jnp.float32))
    rng = np.random.default_rng(0)

    one = jnp.ones(())

    def rtt():
        for _ in range(2):
            float((one + 1).sum())
        t0 = time.time()
        for _ in range(5):
            float((one + 1).sum())
        return (time.time() - t0) / 5

    results = {}

    def bench_rollout(mode, batch):
        tag = f"rollout_b{batch}_{mode}"
        if f"b{batch}" in args.skip or "rollout" in args.skip:
            return
        os.environ["VLG_PACKED_INSPLIT"] = mode
        from video_layout_generation_tpu.models.fast_gridnet import (
            make_packed_rollout_fn)
        ro = make_packed_rollout_fn(n_frames=N_FRAMES, dtype=jnp.bfloat16,
                                    jit=False)
        fn = jax.jit(lambda p, a, b, c, d: jax.tree_util.tree_map(
            lambda t: t.sum(), ro(p, a, b, c, d)),
            compiler_options={"xla_tpu_scoped_vmem_limit_kib": "98304"})
        img = jnp.asarray(rng.random((batch, HW, HW, 3), np.float32))
        seg = jnp.asarray(
            rng.integers(0, 20, (batch, HW, HW, 1)).astype(np.float32))
        tic = time.time()
        float(fn(params, img, img, seg, seg)[0])
        print(f"{tag}: compile+first {time.time()-tic:.1f}s", flush=True)
        ts = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            float(fn(params, img, img, seg, seg)[0])
            ts.append(time.perf_counter() - t0)
        fps = batch * N_FRAMES / min(ts)
        results[tag] = round(fps, 1)
        print(f"{tag}: {fps:.1f} fps", flush=True)

    def bench_train(mode):
        tag = f"train_b16_{mode}"
        if "train" in args.skip:
            return
        os.environ["VLG_PACKED_INSPLIT"] = mode
        from video_layout_generation_tpu.losses.combined import CombinedLoss
        from video_layout_generation_tpu.models import HNED
        from video_layout_generation_tpu.models.fast_gridnet import (
            make_packed_gridnet_apply)
        from video_layout_generation_tpu.train.state import (
            TrainState, make_optimizer)
        from video_layout_generation_tpu.train.steps import make_train_step
        dt = jnp.bfloat16
        tmodel = GridNet(n_channels=10, dtype=dt)
        hned = HNED(dtype=dt)
        combined = CombinedLoss.create(dtype=dt, image_hw=(HW, HW))
        tparams = jax.jit(tmodel.init)(
            jax.random.key(0), jnp.zeros((1, HW, HW, 10), jnp.float32))
        hparams = jax.jit(hned.init)(
            jax.random.key(1), jnp.zeros((1, HW, HW, 3), jnp.float32))
        apply_fn = make_packed_gridnet_apply(dtype=dt, coord_in=False)
        step = make_train_step(apply_fn, hned.apply, combined, donate=False)
        b = 16
        batch = {
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
        st = TrainState.create(tparams, make_optimizer("adam", 2e-4, 0.5))
        key = jax.random.key(2)
        tic = time.time()
        _, metrics = step(st, hparams, batch, key)
        print(f"{tag}: compile+first {time.time()-tic:.1f}s "
              f"loss {float(metrics['loss']):.3f}", flush=True)
        r = rtt()
        ts = []
        for _ in range(args.repeats):
            t0 = time.time()
            _, metrics = step(st, hparams, batch, key)
            float(metrics["loss"])
            ts.append(time.time() - t0)
        ms = (min(ts) - r) * 1000
        results[tag] = round(ms, 1)
        print(f"{tag}: {ms:.1f} ms/step (rtt {r*1000:.0f} ms)", flush=True)

    for mode in args.modes:
        bench_rollout(mode, 256)
    for mode in args.modes:
        bench_rollout(mode, 16)
    for mode in args.modes:
        bench_train(mode)
    os.environ.pop("VLG_PACKED_INSPLIT", None)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

"""Edge-mode rollout: batch x row-0 packing sweep.

The no-edge packed rollout is batch-adaptive (2x2 wins b8-b64 by 23-29%,
1x2 wins b128 — BENCH_NOTES batch sweep), but the edge-mode rollout
(HNED recomputed per generated frame inside the scan) still pins its apply
to 1x2. Measure the same crossover here to decide whether the edge path
should dispatch per batch too.

  timeout 3000 python tools/edge_rollout_batch_sweep.py
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import json
import time

import numpy as np

N_FRAMES, HW = 8, 256
BATCHES = (8, 32, 128)
PACKINGS = ("1x2", "2x2")


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from video_layout_generation_tpu.models import HNED, GridNet
    from video_layout_generation_tpu.models.fast_gridnet import (
        make_packed_gridnet_apply)
    from video_layout_generation_tpu.train.rollout import make_rollout_fn

    dt = jnp.bfloat16
    model = GridNet(n_channels=10, dtype=dt)
    hned = HNED(dtype=dt)
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, HW, HW, 10), jnp.float32))
    hp = jax.jit(hned.init)(jax.random.key(1),
                            jnp.zeros((1, HW, HW, 3), jnp.float32))

    rng = np.random.default_rng(0)
    one = jnp.ones(())
    for _ in range(2):
        float((one + 1).sum())
    t0 = time.time()
    for _ in range(5):
        float((one + 1).sum())
    rtt = (time.time() - t0) / 5
    print(f"rtt {rtt*1000:.1f} ms", flush=True)

    rows = []
    for packing in PACKINGS:
        apply = make_packed_gridnet_apply(dtype=dt, packing=packing)
        ro = make_rollout_fn(apply, hned.apply, n_frames=N_FRAMES,
                             use_edges=True, jit=False)
        fn = jax.jit(lambda p, h, a, b, c, d, _ro=ro:
                     jax.tree_util.tree_map(lambda t: t.sum(),
                                            _ro(p, h, a, b, c, d)),
                     compiler_options={
                         "xla_tpu_scoped_vmem_limit_kib": "98304"})
        for batch in BATCHES:
            img = jnp.asarray(rng.random((batch, HW, HW, 3), np.float32))
            seg = jnp.asarray(
                rng.integers(0, 20, (batch, HW, HW, 1)).astype(np.float32))
            tic = time.time()
            float(fn(params, hp, img, img, seg, seg)[0])
            compile_s = time.time() - tic
            ts = []
            for _ in range(3):
                tic = time.time()
                float(fn(params, hp, img, img, seg, seg)[0])
                ts.append(time.time() - tic)
            d = min(ts) - rtt
            rec = {"packing": packing, "batch": batch,
                   "ms": round(d * 1000, 1),
                   "fps": round(batch * N_FRAMES / d, 1),
                   "compile_s": round(compile_s, 1)}
            rows.append(rec)
            print(json.dumps(rec), flush=True)
    print(json.dumps({"sweep": rows}))


if __name__ == "__main__":
    main()

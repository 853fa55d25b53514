"""Edge-mode rollout bench: upsample knob x compiler options.

The edge-carrying rollout (HNED recomputed on each generated frame inside
the scan — the training-distribution-matched inference mode) measured 690
fps at b128 in round 1. A/Bs the rollout_upsample knob and the scoped-vmem
compile budget on it.

  python tools/bench_edge_rollout.py
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np

BATCH, N_FRAMES, HW = 128, 8, 256


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

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
    img = jnp.asarray(rng.random((BATCH, HW, HW, 3), np.float32))
    seg = jnp.asarray(
        rng.integers(0, 20, (BATCH, HW, HW, 1)).astype(np.float32))

    one = jnp.ones(())
    for _ in range(2):
        float((one + 1).sum())
    t0 = time.time()
    for _ in range(5):
        float((one + 1).sum())
    rtt = (time.time() - t0) / 5
    print(f"rtt {rtt*1000:.1f} ms", flush=True)

    for up in ("bilinear", "nearest"):
        apply = make_packed_gridnet_apply(dtype=dt, packing="1x2",
                                          upsample=up)
        ro = make_rollout_fn(apply, hned.apply, n_frames=N_FRAMES,
                             use_edges=True, jit=False)
        for opts_tag, opts in (("default", None),
                               ("vmem96m",
                                {"xla_tpu_scoped_vmem_limit_kib": "98304"})):
            fn = jax.jit(lambda p, h, a, b, c, d: jax.tree_util.tree_map(
                lambda t: t.sum(), ro(p, h, a, b, c, d)),
                compiler_options=opts)
            tic = time.time()
            float(fn(params, hp, img, img, seg, seg)[0])
            print(f"{up}/{opts_tag}: compile+first {time.time()-tic:.1f}s",
                  flush=True)
            ts = []
            for _ in range(3):
                tic = time.time()
                float(fn(params, hp, img, img, seg, seg)[0])
                ts.append(time.time() - tic)
            d = min(ts) - rtt
            print(f"{up}/{opts_tag}: {d*1000:.1f} ms -> "
                  f"{BATCH*N_FRAMES/d:.1f} fps", flush=True)


if __name__ == "__main__":
    main()

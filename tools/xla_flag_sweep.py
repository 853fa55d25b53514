"""Sweep XLA TPU compiler options on the north-star rollout.

XLA_FLAGS env can't carry TPU-backend flags here (the local client's parser
rejects them and the axon terminal overrides the env anyway), but per-compile
``compiler_options`` are forwarded to the remote compiler. Tries a small set
of plausibly-relevant knobs on the full b128 rollout program and reports
RTT-corrected timings vs the default compile.

  python tools/xla_flag_sweep.py
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np

BATCH = int(__import__("os").environ.get("SWEEP_BATCH", "128"))
N_FRAMES, HW = 8, 256

VARIANTS = [
    ("default", {}),
    ("vmem64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("vmem96m", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
    ("vmem128m", {"xla_tpu_scoped_vmem_limit_kib": "131072"}),
    ("vmem96m_lhs", {"xla_tpu_scoped_vmem_limit_kib": "98304",
                     "xla_tpu_enable_latency_hiding_scheduler": "true"}),
]


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from video_layout_generation_tpu.models import GridNet
    from video_layout_generation_tpu.models.fast_gridnet import (
        make_packed_rollout_fn)

    model = GridNet(n_channels=8, dtype=jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, HW, HW, 8), jnp.float32))
    ro = make_packed_rollout_fn(n_frames=N_FRAMES, dtype=jnp.bfloat16,
                                jit=False)
    fn = lambda p, a, b, c, d: jax.tree_util.tree_map(
        lambda t: t.sum(), ro(p, a, b, c, d))

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

    for tag, opts in VARIANTS:
        try:
            tic = time.time()
            compiled = (jax.jit(fn)
                        .lower(params, img, img, seg, seg)
                        .compile(compiler_options=opts or None))
            out = compiled(params, img, img, seg, seg)
            float(out[0])
            print(f"{tag}: compile+first {time.time()-tic:.1f}s", flush=True)
        except Exception as e:
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        times = []
        for _ in range(5):
            tic = time.time()
            float(compiled(params, img, img, seg, seg)[0])
            times.append(time.time() - tic)
        dt = min(times) - rtt
        print(f"{tag}: {dt*1000:.1f} ms -> {BATCH*N_FRAMES/dt:.1f} fps",
              flush=True)


if __name__ == "__main__":
    main()

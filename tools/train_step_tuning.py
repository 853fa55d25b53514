"""A/B compiler options on the production TRAIN step (256px, b16, HNED
edges, bf16, packed training forward) — the rollout gained +1.4% from a
96MB scoped-vmem budget (tools/xla_flag_sweep.py); this checks the
fwd+bwd+Adam program.

  python tools/train_step_tuning.py
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np

B, HW = 16, 256

VARIANTS = [
    ("default", None),
    ("vmem64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("vmem96m", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
]


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
    apply = make_packed_gridnet_apply(dtype=dt, coord_in=False)

    # make_train_step returns an already-jitted fn; rebuild the underlying
    # python callable by disabling donation and re-jitting with options
    rng = np.random.default_rng(0)
    batch = {
        "img1": jnp.asarray(rng.random((B, HW, HW, 3), np.float32)),
        "img2": jnp.asarray(rng.random((B, HW, HW, 3), np.float32)),
        "img3": jnp.asarray(rng.random((B, HW, HW, 3), np.float32)),
        "seg1": jnp.asarray(
            rng.integers(0, 20, (B, HW, HW, 1)).astype(np.float32)),
        "seg2": jnp.asarray(
            rng.integers(0, 20, (B, HW, HW, 1)).astype(np.float32)),
        "seg3": jnp.asarray(
            rng.integers(0, 20, (B, HW, HW)).astype(np.int32)),
    }
    key = jax.random.key(2)

    one = jnp.ones(())
    for _ in range(2):
        float((one + 1).sum())
    t0 = time.time()
    for _ in range(5):
        float((one + 1).sum())
    rtt = (time.time() - t0) / 5
    print(f"rtt {rtt*1000:.1f} ms", flush=True)

    for tag, opts in VARIANTS:
        step = make_train_step(apply, hned.apply, combined, donate=False)
        # unwrap the jit to re-jit with compiler options
        inner = step.__wrapped__
        fn = jax.jit(inner, compiler_options=opts)
        tic = time.time()
        state, metrics = fn(state0, hned_params, batch, key)
        float(metrics["loss"])
        print(f"{tag}: compile+first {time.time()-tic:.1f}s", flush=True)
        ts = []
        for _ in range(5):
            tic = time.time()
            state, metrics = fn(state0, hned_params, batch, key)
            float(metrics["loss"])
            ts.append(time.time() - tic)
        dtm = min(ts) - rtt
        print(f"{tag}: {dtm*1000:.1f} ms/step -> {B/dtm:.1f} samples/s",
              flush=True)


if __name__ == "__main__":
    main()

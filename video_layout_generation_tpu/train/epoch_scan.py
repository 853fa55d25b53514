"""Epoch-as-scan executor: one compiled program per training EPOCH.

With on-device rendering (data/device_synthetic.py) a training step needs
no host data at all, so the per-step Python dispatch — a serial RPC round
trip on tunneled/remote devices, measured as the dominant wall-clock cost
(BENCH_NOTES "device-data wall-clock A/B": 393 ms/step wall vs ~128 ms
device compute) — can be eliminated entirely: the whole epoch becomes one
``lax.scan`` over shuffled index batches inside a single jitted program.
The host dispatches ONCE per epoch and fetches the per-step loss stack.

TPU design notes: the scan carries the full ``TrainState`` (params + Adam
moments stay resident in HBM, donated across epochs); batches are rendered
by the same traceable renderer the per-step path uses; per-step RNG is
``fold_in(base_key, global_step)`` — bit-identical to the Trainer's
per-step stream, so scan/no-scan training walk the same parameter
trajectory (up to XLA reassociation noise; tests/test_epoch_scan.py).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def make_epoch_scan(render_fn: Callable, raw_step: Callable,
                    donate: bool = True):
    """Build ``epoch(state, hned_params, idx_all, base_key, step0)`` ->
    ``(state, losses (n_steps,))``.

    render_fn: ``idx (B,) -> batch dict`` (traceable; device renderer).
    raw_step: un-jitted train step ``(state, hned_params, batch, rng)``
    (make_train_step / make_multistep_train_step with ``jit=False``).
    idx_all: (n_steps, B) int32 shuffled sample indices.
    step0: global step count before this epoch (continues the fold_in
    stream exactly where the per-step path would).
    """

    def epoch(state, hned_params, idx_all, base_key, step0):
        n = idx_all.shape[0]

        def body(st, xs):
            idx, i = xs
            rng = jax.random.fold_in(base_key, step0 + i + 1)
            st2, metrics = raw_step(st, hned_params, render_fn(idx), rng)
            return st2, metrics["loss"]

        state, losses = jax.lax.scan(
            body, state, (idx_all, jnp.arange(n, dtype=jnp.int32)))
        return state, losses

    # step0 stays a dynamic scalar — epochs reuse one compiled program
    return jax.jit(epoch, donate_argnums=(0,) if donate else ())

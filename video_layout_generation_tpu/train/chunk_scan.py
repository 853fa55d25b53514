"""Chunked K-step dispatch for HOST-FED data: upload K batches as one
array, run K train steps in one compiled ``lax.scan``, fetch once.

Why: on tunneled/remote devices every Python dispatch and every
host->device put is a serial round trip, so per-step training pays
wall/step 0.25-0.5 s against ~128 ms of device compute. The epoch-as-scan
executor (train/epoch_scan.py) eliminated dispatch entirely but only for
on-device-rendered synthetic data. This generalizes the win to ANY
dataset — including the reference's real Cityscapes tree
(reference src/trainer.py:145-152 prefetch pipeline) — by composing the
existing pieces: the packed uint8 single-array transfer
(data/pipeline.py:pack_triplet_batch), the un-jitted raw step
(train/steps.py ``jit=False``), and the scan-executor pattern.

Per-chunk cost: ONE put of a (K, B, H, W, 12) uint8 stack, ONE program
dispatch, ONE scalar fetch — K-fold fewer round trips. RNG per scanned
step is ``fold_in(base_key, step0 + i + 1)``, bit-identical to the
Trainer's per-step stream, so chunked/per-step training walk the same
trajectory (tests/test_chunk_scan.py).

Multi-process: each process stacks its LOCAL shard of each batch; the
global (K, B_global, ...) array is assembled with
``jax.make_array_from_process_local_data`` under a (None, 'data')
PartitionSpec — the scan axis is replicated, the batch axis sharded, so
the in-step collectives are unchanged from the per-step path.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_chunk_scan(raw_step, donate: bool = True):
    """Build ``chunk(state, hned_params, stacked, base_key, step0)`` ->
    ``(state, losses (K,))``.

    raw_step: un-jitted train step (``make_train_step(..., jit=False)`` or
    the multistep equivalent).
    stacked: batch dict whose leaves carry a leading scan axis K.
    step0: global step count before this chunk (dynamic scalar — every
    chunk of the same K reuses one compiled program).
    """

    def chunk(state, hned_params, stacked, base_key, step0):
        n = next(iter(jax.tree_util.tree_leaves(stacked))).shape[0]

        def body(st, xs):
            batch_i, i = xs
            rng = jax.random.fold_in(base_key, step0 + i + 1)
            st2, metrics = raw_step(st, hned_params, batch_i, rng)
            return st2, metrics["loss"]

        state, losses = jax.lax.scan(
            body, state, (stacked, jnp.arange(n, dtype=jnp.int32)))
        return state, losses

    return jax.jit(chunk, donate_argnums=(0,) if donate else ())


def stack_batches(batches: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    """Stack K same-schema host batches along a new leading scan axis.

    With the packed-transfer pipeline each batch is one (B, H, W, 12)
    uint8 array, so the result is ONE (K, B, H, W, 12) array — a single
    host->device put per chunk."""
    keys = batches[0].keys()
    return {k: np.stack([b[k] for b in batches]) for k in keys}


def put_chunk(stacked: Dict[str, np.ndarray], mesh: Mesh,
              axis: str = "data") -> Dict[str, jnp.ndarray]:
    """Device-put a stacked chunk: scan axis replicated, batch axis
    sharded over the mesh (multi-process assembles the global array from
    each process's local shard)."""
    sh = NamedSharding(mesh, P(None, axis))
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sh, x), stacked)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), stacked)


def put_batch(batch: Dict[str, np.ndarray], mesh: Mesh,
              axis: str = "data") -> Dict[str, jnp.ndarray]:
    """Single-batch put with plain batch sharding (the tail of an epoch
    whose length isn't a multiple of K goes through the per-step path)."""
    sh = NamedSharding(mesh, P(axis))
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sh, x), batch)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def iter_chunks(host_loader, k: int):
    """Yield lists of up to ``k`` consecutive host batches (the tail list
    may be shorter; the Trainer runs it through the per-step path to avoid
    compiling a second scan program)."""
    buf: List[dict] = []
    for b in host_loader:
        buf.append(b)
        if len(buf) == k:
            yield buf
            buf = []
    if buf:
        yield buf

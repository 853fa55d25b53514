"""Device mesh + sharding helpers (the TPU-native successor to the
reference's NCCL/DDP layer, SURVEY.md §2b).

The reference ran one process per GPU with DDP gradient allreduce
(reference src/main.py:53-54, src/trainer.py:113-115). Here a single program
drives a ``jax.sharding.Mesh``; the batch is sharded over the 'data' axis,
params are replicated, and gradient reduction happens inside the jitted step
as XLA collectives over ICI — no explicit allreduce code.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and
everything extends across hosts transparently (DCN between slices);
``is_primary()`` replaces the reference's ``rank == 0`` gating.

The mesh reserves room for more axes ('model' is accepted for forward
compatibility with tensor-parallel variants), but DP is the only strategy
the reference has (SURVEY.md §2b) — and the only one wired in round 1.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None,
              shape: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = ("data",)) -> Mesh:
    """Build a mesh over the given (default: all) devices.

    shape defaults to putting every device on the first axis.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    if shape is None:
        shape = [len(devices)] + [1] * (len(axis_names) - 1)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, "
                         f"have {len(devices)}")
    arr = np.array(devices[:n]).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Device-put a pytree of host arrays with batch-dim sharding."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def is_primary() -> bool:
    """Process-0 gating (reference's ``rank == 0``)."""
    return jax.process_index() == 0


def maybe_initialize_distributed() -> bool:
    """Multi-host bring-up: call jax.distributed.initialize() when the
    standard coordinator env vars are present (the TPU-native successor to
    the reference's NCCL TCP rendezvous, src/main.py:53-54). Single-host
    runs are untouched. Returns True if initialization happened."""
    import os
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or \
            os.environ.get("COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
        return True
    return False

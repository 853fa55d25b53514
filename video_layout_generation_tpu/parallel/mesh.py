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


def cross_process_barrier(name: str, timeout_s: int = 1200) -> None:
    """Block until every process in the ``jax.distributed`` group reaches
    this barrier (no-op outside a process group).

    Why this exists: Gloo CPU collectives initialize their context during the
    FIRST cross-process program execution with a hard 30 s KV-store deadline.
    On a slow host a peer still inside a cold XLA compile blows that deadline
    and kills the whole group. The fix is structural: AOT-compile every
    multi-process program first, barrier here (generous timeout — compiles,
    not collectives, dominate), and only then execute, so all processes enter
    the Gloo context init within milliseconds of each other. The reference
    has the same problem class with NCCL rendezvous and solves it with
    NCCL_TIMEOUT env knobs; a barrier keyed on compile completion is the
    robust version.
    """
    from jax._src import distributed
    client = distributed.global_state.client
    if client is None:  # not a multi-process run
        return
    client.wait_at_barrier(name, timeout_in_ms=timeout_s * 1000,
                           process_ids=None)


def compile_then_barrier(jitted, *args, name: str, timeout_s: int = 1200):
    """AOT-compile a jitted callable against concrete/abstract args, then
    barrier the process group. Returns the compiled executable.

    Use this for every program whose execution issues cross-process
    collectives: compilation is purely local, so compiling BEFORE the
    barrier guarantees no process is still compiling when the first
    collective's Gloo/ICI context handshake (with its short internal
    deadline) begins.
    """
    compiled = jitted.lower(*args).compile()
    cross_process_barrier(name, timeout_s)
    return compiled


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

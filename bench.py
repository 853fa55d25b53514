"""North-star benchmark: autoregressive layout rollout frames/sec/chip.

Workload (BASELINE.md): GridNet (filters 32/64/96) autoregressive rollout at
256x256 — the reference's ``generate_sequence`` semantics (8-channel input,
argmax layout feedback, 8 future frames). Ours runs as ONE compiled
``lax.scan`` in bf16, batched; the baseline is the reference-equivalent
torch-CPU rollout measured by tools/torch_cpu_baseline.py (cached in
BASELINE_CPU.json; the reference publishes no numbers).

Timing note: ``block_until_ready`` is unreliable on the tunneled TPU
platform, so the rollout is wrapped in a device-side reduction and synced by
fetching the scalar — the transfer cost is negligible.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

BATCH = 256  # round-2 sweep: b256@1x2 958 fps > b128 940 (b512 OOMs, b192 tiles badly)
N_FRAMES = 8
HW = 256
REPEATS = 3

_REPO = os.path.dirname(os.path.abspath(__file__))

# Best result so far — the budget watchdog emits this (partial but honest)
# instead of an error line if the batched phase finished but a later phase
# (e.g. batch-1 latency) outlives the driver's budget.
_RESULT: dict = {}


def _load_baseline() -> float:
    path = os.path.join(_REPO, "BASELINE_CPU.json")
    if not os.path.exists(path):
        subprocess.run(
            [sys.executable, os.path.join(_REPO, "tools",
                                          "torch_cpu_baseline.py")],
            check=True, stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL)
    with open(path) as f:
        return float(json.load(f)["frames_per_sec"])


def _arm_watchdog(seconds: int = 2400):
    """The tunneled TPU can wedge (device RPCs never return and
    block_until_ready is a no-op); fail loudly instead of hanging the
    harness. A daemon timer thread is used because the main thread blocks
    inside a native RPC call where signal handlers never run."""
    import threading

    def _abort():
        if _RESULT.get("value") is not None:
            out = dict(_RESULT)
            out["note"] = f"partial: aborted after {seconds}s budget"
            sys.stdout.write(json.dumps(out) + "\n")
        else:
            sys.stdout.write(json.dumps({
                "metric": "layout rollout frames/sec/chip",
                "value": None, "unit": "frames/sec/chip",
                "vs_baseline": None,
                "error": f"TPU unresponsive for {seconds}s (tunnel wedged)"})
                + "\n")
        sys.stdout.flush()
        os._exit(2)

    t = threading.Timer(seconds, _abort)
    t.daemon = True
    t.start()
    return t


def _take_tpu_lock(max_wait: float = 150.0):
    """Serialize with the tool jobs: every TPU entry point in tools/ wraps
    itself in ``flock /tmp/vlg_tpu.lock``; bench.py must too, or the
    driver's round-end bench can race a still-running leg straight into a
    wedged tunnel (that is exactly how BENCH_r04 came back null). Bounded
    wait: if a runaway job holds the lock past ``max_wait`` we proceed
    anyway (the liveness probe + watchdogs below still bound the damage)
    rather than burn the whole driver budget queueing."""
    import fcntl
    try:
        f = open("/tmp/vlg_tpu.lock", "w")
    except OSError:
        return None
    deadline = time.time() + max_wait
    while True:
        try:
            fcntl.flock(f, fcntl.LOCK_EX | fcntl.LOCK_NB)
            return f  # keep open: lock held for process lifetime
        except OSError:
            if time.time() >= deadline:
                _RESULT["lock_note"] = (
                    "proceeded without vlg_tpu.lock after %.0fs wait"
                    % max_wait)
                return f
            time.sleep(2.0)


def main():
    global _T_START
    _T_START = time.time()
    _arm_watchdog()
    _LOCK = _take_tpu_lock()  # noqa: F841 — held until exit
    import jax
    # fast liveness gate: if the tunnel is dead, a trivial op hangs and the
    # 2400s watchdog outlives the driver's budget — probe with a dedicated
    # deadline first so a dead device yields the error JSON line quickly.
    # 420s, not less: a live-but-stormy tunnel has measured 30-390s for this
    # trivial op (round 3: 390s observed, then full recovery), and a false
    # "wedged" verdict costs the whole bench. Beyond ~420s the driver's
    # budget is gone anyway, so fail loudly there.
    probe = _arm_watchdog(420)
    import jax.numpy as _jnp
    float(jax.jit(lambda x: (x * 2).sum())(_jnp.ones((8, 8))))
    probe.cancel()
    # Budget watchdog (ADVICE r3): if the probe ate most of the driver's
    # budget (VLG_BENCH_BUDGET, default 580s), still emit a JSON line —
    # partial results if the batched phase finished, error line otherwise.
    budget = float(os.environ.get("VLG_BENCH_BUDGET", "580"))
    remaining = max(budget - (time.time() - _T_START) - 15.0, 30.0)
    _arm_watchdog(int(remaining))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from video_layout_generation_tpu.models import GridNet
    from video_layout_generation_tpu.models.fast_gridnet import (
        make_packed_rollout_fn)

    model = GridNet(n_channels=8, dtype=jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, HW, HW, 8), jnp.float32))

    # fully-packed rollout: the whole autoregressive loop (model, argmax
    # feedback, input assembly) runs in space-to-depth space; seeds pack
    # once, outputs unpack once (models/fast_gridnet.py)
    ro_packed = make_packed_rollout_fn(n_frames=N_FRAMES,
                                       dtype=jnp.bfloat16, jit=False)
    # device-side reduction -> sync by fetching one scalar.
    # 96MB scoped-vmem budget: measured +1.4% over the 16MB default on the
    # full rollout (larger conv fusions; tools/xla_flag_sweep.py).
    fn = jax.jit(lambda p, a, b, c, d: jax.tree_util.tree_map(
        lambda t: t.sum(), ro_packed(p, a, b, c, d)),
        compiler_options={"xla_tpu_scoped_vmem_limit_kib": "98304"})

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((BATCH, HW, HW, 3), np.float32))
    seg = jnp.asarray(
        rng.integers(0, 20, (BATCH, HW, HW, 1)).astype(np.float32))

    float(fn(params, img, img, seg, seg)[0])  # compile + warmup

    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(fn(params, img, img, seg, seg)[0])
        times.append(time.perf_counter() - t0)
    best = min(times)
    fps = BATCH * N_FRAMES / best
    baseline = _load_baseline()
    _RESULT.update({
        "metric": "layout rollout frames/sec/chip (256px, GridNet, "
                  "8-frame autoregressive, batch %d)" % BATCH,
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / baseline, 2),
    })

    # single-stream latency (batch 1, same 8-frame workload) as an extra
    # field; attempted whenever ≥60s of the driver budget remain (the b1
    # program is pre-warmed into .jax_cache by the hardware queue, so the
    # warm-cache cost is one small compile fetch + a few device calls; the
    # budget watchdog above emits the partial batched result if this phase
    # overruns anyway).
    # Both numbers are reported: wall includes the tunnel round trip
    # (~27 ms nominal, weather-dependent); device subtracts an RTT measured
    # in the same second with a trivial pre-compiled scalar fetch — that is
    # the on-chip latency a local host would see.
    b1_wall_ms = b1_dev_ms = None
    if budget - (time.time() - _T_START) > 60:
        try:
            tiny = jax.jit(lambda x: (x * 2).sum())
            float(tiny(_jnp.ones((8, 8))))  # compiled above; warm again
            i1, s1 = img[:1], seg[:1]
            float(fn(params, i1, i1, s1, s1)[0])  # compile + warmup
            ts, rtts = [], []
            for _ in range(REPEATS * 2):
                t0 = time.perf_counter()
                float(tiny(_jnp.ones((8, 8))))
                rtts.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                float(fn(params, i1, i1, s1, s1)[0])
                ts.append(time.perf_counter() - t0)
            b1_wall_ms = round(min(ts) * 1000, 1)
            b1_dev_ms = round(max(min(ts) - min(rtts), 0.0) * 1000, 1)
        except Exception as e:  # surface it — a silent miss cost round 3 item #6
            b1_wall_ms = b1_dev_ms = None
            _RESULT["batch1_error"] = f"{type(e).__name__}: {e}"[:300]

    if b1_wall_ms is not None:
        _RESULT["batch1_latency_wall_ms"] = b1_wall_ms
        _RESULT["batch1_latency_device_ms"] = b1_dev_ms
    print(json.dumps(_RESULT))


if __name__ == "__main__":
    main()

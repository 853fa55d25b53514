"""Composed roofline for the packed rollout (VERDICT r4 #4).

Two phases:

1. **Inventory** (host, no device): trace the exact bench workload
   (`make_packed_rollout_fn`, bench.py shapes) to a jaxpr and walk it,
   collecting every `conv_general_dilated` with its operand shapes —
   multiplied through `lax.scan` trip counts — so the FLOP mix is the
   *program's own*, not a hand-derived approximation.

2. **Microbench** (TPU): time each DISTINCT conv shape in isolation
   (jit'd conv + scalar-fetch sync, min-of-N, RTT subtracted). Isolated
   min-time is each conv's speed-of-light on this chip *as XLA compiles
   it* — no fusion losses, no dependency stalls. The composed ceiling is

       fps_ceiling = batch * n_frames / sum_i(count_i * t_i)

   Any real program pays scheduling, fusion boundaries, elementwise ops,
   argmax/one-hot feedback, and the resize stencils ON TOP of this, so
   measured fps < ceiling always; the interesting number is the ratio.

Usage:
  python tools/roofline.py --inventory-only        # host-side, no TPU
  flock /tmp/vlg_tpu.lock python tools/roofline.py # full (TPU microbench)
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import argparse
import json
import time
from collections import defaultdict


def collect_convs(jaxpr, mult=1, acc=None):
    """Walk a (Closed)Jaxpr; return {(lhs_shape, rhs_shape, out_shape,
    strides, dimension_numbers_str): count} with scan trip counts applied."""
    if acc is None:
        acc = defaultdict(int)
    inner = getattr(jaxpr, "jaxpr", jaxpr)
    for eqn in inner.eqns:
        name = eqn.primitive.name
        if name == "conv_general_dilated":
            lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
            out = eqn.outvars[0].aval
            key = (tuple(lhs.shape), tuple(rhs.shape), tuple(out.shape),
                   tuple(eqn.params["window_strides"]), str(lhs.dtype))
            acc[key] += mult
        elif name == "scan":
            collect_convs(eqn.params["jaxpr"],
                          mult * int(eqn.params["length"]), acc)
        elif name == "while":
            # not used in the rollout; count body once if it appears
            collect_convs(eqn.params["body_jaxpr"], mult, acc)
        elif name == "cond":
            for br in eqn.params["branches"]:
                collect_convs(br, mult, acc)
                break  # one branch executes
        else:
            for pname in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                sub = eqn.params.get(pname)
                if sub is not None:
                    collect_convs(sub, mult, acc)
    return acc


def conv_flops(lhs, rhs, out):
    """MACs*2 for NHWC lhs / HWIO rhs / NHWC out (the packed executor's
    layout throughout)."""
    n, ho, wo = out[0], out[1], out[2]
    co = out[3]
    kh, kw, ci = rhs[0], rhs[1], rhs[2]
    return 2 * n * ho * wo * co * kh * kw * ci


def build_rollout(batch, hw, n_frames):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from video_layout_generation_tpu.models import GridNet
    from video_layout_generation_tpu.models.fast_gridnet import (
        make_packed_rollout_fn)

    model = GridNet(n_channels=8, dtype=jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, hw, hw, 8), jnp.float32))
    ro = make_packed_rollout_fn(n_frames=n_frames, dtype=jnp.bfloat16,
                                jit=False)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((batch, hw, hw, 3), np.float32))
    seg = jnp.asarray(
        rng.integers(0, 20, (batch, hw, hw, 1)).astype(np.float32))
    return ro, params, (img, img, seg, seg)


def microbench_conv(key, repeats=5):
    """Isolated best-case time for one conv shape: jit(conv + sum), warm,
    min-of-N wall minus min RTT measured with a pre-compiled scalar op.

    Sub-millisecond kernels drown in tunnel RTT variance (a first pass
    measured the C96@64x64 lateral at an impossible 3,132 TF/s), so
    shape-preserving convs are CHAINED: 16 data-dependent applications in
    one program, divide by 16. Shape-changing convs at these sizes are
    all >= ~1.7 ms and time fine singly."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    lhs_s, rhs_s, out_s, strides, dtype = key
    dt = jnp.dtype(dtype)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(lhs_s), dt)
    w = jnp.asarray(rng.standard_normal(rhs_s), dt)

    pad = "SAME" if out_s[1] * strides[0] >= lhs_s[1] else "VALID"

    def conv(z, w):
        return jax.lax.conv_general_dilated(
            z, w, strides, pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def timed(chain):
        @jax.jit
        def f(x, w):
            z = conv(x, w)
            for _ in range(chain - 1):
                z = conv(z, w)  # data-dependent: cannot elide or overlap
            return z.sum()

        tiny = jax.jit(lambda v: (v * 2).sum())
        float(tiny(jnp.ones((8, 8))))
        out = f(x, w)
        assert out.shape == (), out.shape
        float(out)  # compile+warm
        ts, rtts = [], []
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(tiny(jnp.ones((8, 8))))
            rtts.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(f(x, w))
            ts.append(time.perf_counter() - t0)
        return max(min(ts) - min(rtts), 1e-9) / chain

    t = timed(1)
    if t < 2e-3 and tuple(lhs_s) == tuple(out_s):
        t = timed(16)  # single-shot is below RTT-noise resolution
    return t


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--hw", type=int, default=256)
    p.add_argument("--n_frames", type=int, default=8)
    p.add_argument("--inventory-only", action="store_true")
    p.add_argument("--measured_fps", type=float, default=960.0,
                   help="the bench number to compare the ceiling against")
    args = p.parse_args(argv)

    import jax
    if args.inventory_only:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")

    ro, params, ins = build_rollout(args.batch, args.hw, args.n_frames)
    jaxpr = jax.make_jaxpr(ro)(params, *ins)
    convs = collect_convs(jaxpr)

    rows = []
    total_flops = 0
    for key, count in sorted(convs.items(),
                             key=lambda kv: -conv_flops(kv[0][0], kv[0][1],
                                                        kv[0][2]) * kv[1]):
        fl = conv_flops(key[0], key[1], key[2])
        total_flops += fl * count
        rows.append({"lhs": key[0], "rhs": key[1], "out": key[2],
                     "strides": key[3], "dtype": key[4], "count": count,
                     "gflops_each": round(fl / 1e9, 2)})
    print(f"# conv inventory: {sum(convs.values())} conv executions, "
          f"{len(convs)} distinct shapes, "
          f"{total_flops/1e12:.2f} TFLOP total "
          f"({args.batch}x{args.n_frames} frames)")
    for r in rows:
        print(json.dumps(r))

    if args.inventory_only:
        return

    print("# microbenching each distinct shape on the device...")
    t_total = 0.0
    for r, (key, count) in zip(
            rows, sorted(convs.items(),
                         key=lambda kv: -conv_flops(kv[0][0], kv[0][1],
                                                    kv[0][2]) * kv[1])):
        t = microbench_conv(key)
        fl = conv_flops(key[0], key[1], key[2])
        r["ms_each"] = round(t * 1e3, 3)
        r["tf_per_s"] = round(fl / t / 1e12, 1)
        r["ms_total"] = round(t * count * 1e3, 1)
        t_total += t * count
        print(json.dumps(r), flush=True)

    frames = args.batch * args.n_frames
    ceiling = frames / t_total
    print(json.dumps({
        "conv_time_ms": round(t_total * 1e3, 1),
        "fps_ceiling_convs_only": round(ceiling, 1),
        "measured_fps": args.measured_fps,
        "measured_over_ceiling": round(args.measured_fps / ceiling, 3),
        "mean_conv_tf_per_s": round(total_flops / t_total / 1e12, 1),
    }))


if __name__ == "__main__":
    main()

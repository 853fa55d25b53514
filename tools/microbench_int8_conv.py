"""Does XLA lower int8 convs to the v5e MXU at the 2x int8 rate?

Probe for a quantized-rollout design decision: times the production
rollout conv shapes (packed row-0 C128@128^2, row-1 C64@128^2, up-conv
C32@256^2) as bf16 vs int8 (preferred_element_type=int32) and prints
achieved TFLOP(TOP)/s. If int8 lands ~2x bf16, an opt-in quantized
inference path is worth building; if XLA upcasts (parity or slower),
drop the idea.

  timeout 580 python tools/microbench_int8_conv.py [--batch 256]
"""

from __future__ import annotations

import argparse
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args(argv)

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    import numpy as np

    shapes = [  # (H, W, Cin, Cout) rollout hot convs (BENCH_NOTES cost map)
        (128, 128, 128, 128),   # packed row-0 lateral
        (128, 128, 64, 64),     # row-1 lateral
        (256, 256, 32, 32),     # up-conv into row 0 (lane-starved)
        (64, 64, 96, 96),       # row-2 lateral
    ]

    def conv(x, k, acc):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=acc)

    def time_one(h, w, cin, cout, dtype, acc):
        b = args.batch
        rng = np.random.default_rng(0)
        if dtype == jnp.int8:
            x = jnp.asarray(rng.integers(-127, 127, (b, h, w, cin)), jnp.int8)
            k = jnp.asarray(rng.integers(-127, 127, (3, 3, cin, cout)),
                            jnp.int8)
        else:
            x = jnp.asarray(rng.standard_normal((b, h, w, cin)), dtype)
            k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)), dtype)
        f = jax.jit(lambda x, k: conv(x, k, acc).sum())
        float(f(x, k))  # compile + warm
        t0 = time.time()
        for _ in range(args.iters):
            out = f(x, k)
        val = float(out)  # fetch-sync (block_until_ready is a no-op on axon)
        dt = (time.time() - t0) / args.iters
        flops = 2 * b * h * w * cin * cout * 9
        return dt * 1e3, flops / dt / 1e12, val

    for h, w, cin, cout in shapes:
        ms_bf, tf_bf, _ = time_one(h, w, cin, cout, jnp.bfloat16, jnp.float32)
        ms_i8, tf_i8, _ = time_one(h, w, cin, cout, jnp.int8, jnp.int32)
        print(f"conv3x3 {cin:3d}->{cout:3d} @{h}x{w} b{args.batch}: "
              f"bf16 {ms_bf:7.2f} ms ({tf_bf:6.1f} TF/s) | "
              f"int8 {ms_i8:7.2f} ms ({tf_i8:6.1f} TOP/s) | "
              f"speedup {ms_bf / ms_i8:.2f}x")


if __name__ == "__main__":
    main()

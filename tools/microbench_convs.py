"""Microbenchmark the conv shapes on the hot paths (run on the real chip).

Sweeps the exact (spatial, channels) conv shapes appearing in the packed
GridNet rollout, plus candidate repackings (1x2 width-only space-to-depth:
2x FLOPs vs the 4x of 2x2 — see BENCH_NOTES.md / CLAUDE.md perf facts),
plus the HNED/VGG stage-1 shapes that dominate the training step.

Timing: tunneled platform — sync via scalar fetch; each measurement loops
the conv ITERS times inside one jit so the ~27ms tunnel RTT amortizes away.

  python tools/microbench_convs.py
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np

ITERS = 30


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    def bench_conv(name, n, h, w, cin, cout, iters=ITERS):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((n, h, w, cin)).astype(np.float32),
                        dtype=jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)).astype(np.float32),
                        dtype=jnp.bfloat16)

        def body(x, k):
            def step(acc, _):
                y = jax.lax.conv_general_dilated(
                    acc, k, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.bfloat16)
                # keep channel count stable for chaining
                return y[..., :cin] if cout != cin else y, None
            y, _ = jax.lax.scan(step, x, None, length=iters)
            return y.astype(jnp.float32).sum()

        f = jax.jit(body)
        float(f(x, k))  # compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(x, k))
            ts.append(time.perf_counter() - t0)
        per = (min(ts) - 0.027) / iters
        fl = 2 * n * h * w * 9 * cin * cout
        print(f"{name:42s} {per*1e3:8.3f} ms/conv  {fl/per/1e12:7.1f} TF/s")
        return per

    B = 128  # rollout bench batch
    print(f"== rollout shapes (batch {B}) ==")
    bench_conv("row0 packed 2x2: 128x128 C128->128", B, 128, 128, 128, 128)
    bench_conv("row1 std:        128x128 C64->64", B, 128, 128, 64, 64)
    bench_conv("row1 packed 1x2: 128x64  C128->128", B, 128, 64, 128, 128)
    bench_conv("row1 packed 2x2: 64x64   C256->256", B, 64, 64, 256, 256)
    bench_conv("row2 std:        64x64   C96->96", B, 64, 64, 96, 96)
    bench_conv("row2 packed 1x2: 64x32   C192->192", B, 64, 32, 192, 192)

    Bt = 16  # train batch
    print(f"== training shapes (batch {Bt}) ==")
    bench_conv("hned/vgg s1:     256x256 C64->64", Bt, 256, 256, 64, 64)
    bench_conv("s1 packed 1x2:   256x128 C128->128", Bt, 256, 128, 128, 128)
    bench_conv("s1 packed 2x2:   128x128 C256->256", Bt, 128, 128, 256, 256)
    bench_conv("hned/vgg s2:     128x128 C128->128", Bt, 128, 128, 128, 128)


if __name__ == "__main__":
    main()

"""Microbench the non-row-0 components of the packed rollout step (b=128).

Identifies the next optimization target after the fused row-0 convs:
row-1/row-2 convs, seg/img head convs (20/3-channel lanes), packed
stride-2 convs, upsample einsums, and the per-step argmax/normalize
epilogue.

  python tools/microbench_step_components.py > /tmp/step_components.log 2>&1
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np

ITERS = 20
B = 128


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from video_layout_generation_tpu.ops.packed import (
        conv_packed_stride2, pack_kernel3x3, pack_kernel3x3_stride2,
        packed_upsample2x_align)
    from video_layout_generation_tpu.ops.resize import (
        upsample2x_bilinear_align)

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    def timeit(name, fn, *args):
        f = jax.jit(lambda *a: fn(*a).astype(jnp.float32).sum())
        float(f(*args))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(*args))
            ts.append(time.perf_counter() - t0)
        ms = (min(ts) - 0.027) * 1e3
        print(f"{name:46s} {ms:8.3f} ms", flush=True)
        return ms

    def arr(*shape, dtype=jnp.bfloat16, scale=1.0):
        return jnp.asarray(
            rng.standard_normal(shape).astype(np.float32) * scale,
            dtype=dtype)

    def conv(x, k, stride=1, pad=1):
        return jax.lax.conv_general_dilated(
            x, k, (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype)

    def rep(fn, n=ITERS):
        def body(x, *rest):
            def step(acc, _):
                return fn(acc, *rest), None
            y, _ = jax.lax.scan(step, x, None, length=n)
            return y
        return body

    # row-2 lateral conv: C96 @64px
    x = arr(B, 64, 64, 96)
    k = arr(3, 3, 96, 96, scale=0.05)
    ms = timeit("row2 conv C96@64 (x20)", rep(lambda a, kk: conv(a, kk)),
                x, k)
    print(f"  -> {ms/ITERS:6.3f} ms/conv "
          f"{2*B*64*64*9*96*96/(ms/ITERS*1e-3)/1e12:5.1f} TF/s", flush=True)

    # seg head convs in packed space (single calls, not chained)
    xp = arr(B, 128, 128, 128)
    k80 = pack_kernel3x3(arr(3, 3, 32, 20, scale=0.05))
    timeit("head packed 128->80 (x1)", lambda a, kk: conv(a, kk), xp, k80)
    x80 = arr(B, 128, 128, 80)
    k8080 = pack_kernel3x3(arr(3, 3, 20, 20, scale=0.05))
    timeit("head packed 80->80 (x1)", lambda a, kk: conv(a, kk), x80, k8080)
    k12 = pack_kernel3x3(arr(3, 3, 32, 3, scale=0.05))
    timeit("head packed 128->12 (x1)", lambda a, kk: conv(a, kk), xp, k12)

    # packed stride-2 conv (row0 -> row1): 512 -> 64... the executor's
    # down_00: packed row0 (128ch) -> 64ch at 128px
    ks2 = pack_kernel3x3_stride2(arr(3, 3, 32, 64, scale=0.05))
    timeit("down packed-s2 128->64 (x1)",
           lambda a, kk: conv_packed_stride2(a, kk), xp, ks2)

    # std stride-2 (row1 -> row2): 64 -> 96 at 128px
    x1 = arr(B, 128, 128, 64)
    ks = arr(3, 3, 64, 96, scale=0.05)
    timeit("down std-s2 64->96 @128 (x1)",
           lambda a, kk: conv(a, kk, stride=2), x1, ks)

    # upsamples
    x2 = arr(B, 64, 64, 96)
    timeit("upsample std x2 96@64->128 (x1)",
           lambda a: upsample2x_bilinear_align(a), x2)
    timeit("packed upsample 64@128->p256 (x1)",
           lambda a: packed_upsample2x_align(a), x1)

    # per-step epilogue: packed argmax over 20 classes + normalize
    segp = arr(B, 128, 128, 80, dtype=jnp.float32)

    def epi_current(sp):
        ids = jnp.argmax(sp.reshape(B, 128, 128, 4, 20), axis=-1)
        return ids.reshape(B, 128, 128, 4).astype(jnp.bfloat16)

    timeit("epilogue argmax (b,128,128,4,20) (x1)", epi_current, segp)

    segp16 = arr(B, 128, 128, 80)
    timeit("epilogue argmax bf16 input (x1)",
           lambda sp: jnp.argmax(
               sp.reshape(B, 128, 128, 4, 20).astype(jnp.float32),
               axis=-1).reshape(B, 128, 128, 4).astype(jnp.bfloat16),
           segp16)

    # img normalize epilogue
    imgp = arr(B, 128, 128, 12, dtype=jnp.float32)
    mean = jnp.tile(jnp.asarray([0.485, 0.456, 0.406], jnp.float32), 4)
    std = jnp.tile(jnp.asarray([0.229, 0.224, 0.225], jnp.float32), 4)
    timeit("epilogue img normalize (x1)",
           lambda ip: ((ip - mean) / std).astype(jnp.bfloat16), imgp)

    print("ALL DONE", flush=True)


if __name__ == "__main__":
    main()

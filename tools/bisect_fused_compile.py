"""Bisect which FUSED-kernel construct hangs the Mosaic compile.

The bare sparse packed conv (ops/pallas/conv_packed.py conv_packed3x3_sparse)
compiles in ~1s on chip; the fused prelu variant hangs. Stages add one
construct each, suspects last:

  A. bare sparse kernel (control)
  B. + residual VMEM input added in the f32 epilogue
  C. + prelu with alpha as a (1,1) f32 VMEM input, f32-cast compare
  D. + prelu via f32 max/min arithmetic (no compare at all), VMEM alpha
  E. + alpha as SMEM scalar (prime suspect)

  python tools/bisect_fused_compile.py > /tmp/bisect2.log 2>&1
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    TH, W, C = 8, 64, 128
    H = 32
    x = jnp.asarray(rng.standard_normal((2, H, W, C)).astype(np.float32),
                    dtype=jnp.bfloat16)
    wa = jnp.asarray(rng.standard_normal((C, 3 * C)).astype(np.float32),
                     dtype=jnp.bfloat16)
    res = jnp.asarray(rng.standard_normal((2, H, W, C)).astype(np.float32),
                      dtype=jnp.bfloat16)
    alpha_v = jnp.full((1, 1), 0.25, jnp.float32)

    def specs(n_extra_vmem=0, smem_scalar=False, with_res=False):
        th = TH
        sp = [
            pl.BlockSpec((1, 1, W, C),
                         lambda i, j: (i, jnp.maximum(j * th - 1, 0), 0, 0)),
            pl.BlockSpec((1, th, W, C), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, W, C),
                         lambda i, j: (i, jnp.minimum(j * th + th, H - 1),
                                       0, 0)),
            pl.BlockSpec((C, 3 * C), lambda i, j: (0, 0)),
        ]
        if smem_scalar:
            sp.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        elif n_extra_vmem:
            sp.append(pl.BlockSpec((1, 1), lambda i, j: (0, 0)))
        if with_res:
            sp.append(pl.BlockSpec((1, th, W, C), lambda i, j: (i, j, 0, 0)))
        return sp

    def run(name, kernel, args, sp):
        print(f"[{time.strftime('%H:%M:%S')}] compiling: {name}",
              flush=True)
        out = pl.pallas_call(
            kernel, grid=(2, H // TH), in_specs=sp,
            out_specs=pl.BlockSpec((1, TH, W, C), lambda i, j: (i, j, 0, 0)),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(*args)
        print(f"  ok: {float(out.astype(jnp.float32).sum()):.2f}",
              flush=True)

    def body(top_ref, mid_ref, bot_ref, w_ref, act=None):
        th, w, c = mid_ref.shape[1:]
        c2 = c // 2
        j = pl.program_id(1)
        nj = pl.num_programs(1)
        top = jnp.where(j == 0, jnp.zeros_like(top_ref[0]), top_ref[0])
        bot = jnp.where(j == nj - 1, jnp.zeros_like(bot_ref[0]), bot_ref[0])
        mid = mid_ref[0]
        if act is not None:
            top, mid, bot = act(top), act(mid), act(bot)
        up = jnp.concatenate([top, mid[:-1]], axis=0)
        dn = jnp.concatenate([mid[1:], bot], axis=0)
        updn = jnp.concatenate([dn[:, :, :c2], up[:, :, c2:]], axis=-1)
        y = jnp.dot(mid.reshape(th * w, c), w_ref[...],
                    preferred_element_type=jnp.float32)
        y = y + jnp.dot(updn.reshape(th * w, c), w_ref[...],
                        preferred_element_type=jnp.float32)
        y = y.reshape(th, w, 3 * c)
        zc = jnp.zeros((th, 1, c), jnp.float32)
        return (y[:, :, c:2 * c]
                + jnp.concatenate([zc, y[:, :-1, :c]], axis=1)
                + jnp.concatenate([y[:, 1:, 2 * c:], zc], axis=1))

    # A. control
    def kA(top_ref, mid_ref, bot_ref, w_ref, out_ref):
        out = body(top_ref, mid_ref, bot_ref, w_ref)
        out_ref[0] = out.astype(out_ref.dtype)

    run("A: bare sparse (control)", kA, (x, x, x, wa), specs())

    # B. + residual input
    def kB(top_ref, mid_ref, bot_ref, w_ref, r_ref, out_ref):
        out = body(top_ref, mid_ref, bot_ref, w_ref)
        out = out + r_ref[0].astype(jnp.float32)
        out_ref[0] = out.astype(out_ref.dtype)

    run("B: + residual input", kB, (x, x, x, wa, res),
        specs(with_res=True))

    # C. + prelu, alpha as (1,1) VMEM, f32 compare
    def kC(top_ref, mid_ref, bot_ref, w_ref, a_ref, out_ref):
        a = a_ref[0, 0].astype(mid_ref.dtype)

        def act(z):
            return jnp.where(z.astype(jnp.float32) >= 0, z, a * z)

        out = body(top_ref, mid_ref, bot_ref, w_ref, act)
        out_ref[0] = out.astype(out_ref.dtype)

    run("C: + prelu (VMEM alpha, f32 cmp)", kC, (x, x, x, wa, alpha_v),
        specs(n_extra_vmem=1))

    # D. + prelu via f32 max/min arithmetic, VMEM alpha
    def kD(top_ref, mid_ref, bot_ref, w_ref, a_ref, out_ref):
        a = a_ref[0, 0]

        def act(z):
            zf = z.astype(jnp.float32)
            return (jnp.maximum(zf, 0.0)
                    + a * jnp.minimum(zf, 0.0)).astype(z.dtype)

        out = body(top_ref, mid_ref, bot_ref, w_ref, act)
        out_ref[0] = out.astype(out_ref.dtype)

    run("D: + prelu (f32 max/min)", kD, (x, x, x, wa, alpha_v),
        specs(n_extra_vmem=1))

    # E. alpha via SMEM (prime suspect)
    def kE(top_ref, mid_ref, bot_ref, w_ref, a_ref, out_ref):
        a = a_ref[0, 0].astype(mid_ref.dtype)

        def act(z):
            return jnp.where(z.astype(jnp.float32) >= 0, z, a * z)

        out = body(top_ref, mid_ref, bot_ref, w_ref, act)
        out_ref[0] = out.astype(out_ref.dtype)

    run("E: + prelu (SMEM alpha)", kE, (x, x, x, wa, alpha_v),
        specs(smem_scalar=True))

    print("ALL STAGES COMPILED", flush=True)


if __name__ == "__main__":
    main()

"""Bisect which Pallas construct hangs the server-side Mosaic compile.

Runs a sequence of tiny kernels, each adding one construct used by the
sparse packed-conv kernels (ops/pallas/conv_packed.py, conv1x2.py),
printing BEFORE each compile — the last printed stage identifies the
construct whose compile hangs. Suspect constructs are ordered last so one
run maximizes information. Tiny shapes so each healthy compile is seconds.
No watchdog, no hard exit (see CLAUDE.md on TPU RPCs).

  python tools/bisect_mosaic_compile.py > /tmp/bisect.log 2>&1
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

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    TH, W, C = 8, 128, 128
    x = jnp.asarray(rng.standard_normal((2, 32, W, C)).astype(np.float32),
                    dtype=jnp.bfloat16)
    wmat = jnp.asarray(rng.standard_normal((C, 3 * C)).astype(np.float32),
                       dtype=jnp.bfloat16)

    def run(name, kernel):
        print(f"[{time.strftime('%H:%M:%S')}] compiling: {name}",
              flush=True)
        h = x.shape[1]
        th = TH
        out = pl.pallas_call(
            kernel,
            grid=(x.shape[0], h // th),
            in_specs=[
                pl.BlockSpec((1, 1, W, C),
                             lambda i, j: (i, jnp.maximum(j * th - 1, 0),
                                           0, 0)),
                pl.BlockSpec((1, th, W, C), lambda i, j: (i, j, 0, 0)),
                pl.BlockSpec((1, 1, W, C),
                             lambda i, j: (i, jnp.minimum(j * th + th,
                                                          h - 1), 0, 0)),
                pl.BlockSpec((C, 3 * C), lambda i, j: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, th, W, C), lambda i, j: (i, j, 0, 0)),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(x, x, x, wmat)
        v = float(out.astype(jnp.float32).sum())
        print(f"  ok: {v:.3f}", flush=True)

    def halo(top_ref, mid_ref, bot_ref):
        j = pl.program_id(1)
        nj = pl.num_programs(1)
        top = jnp.where(j == 0, jnp.zeros_like(top_ref[0]), top_ref[0])
        bot = jnp.where(j == nj - 1, jnp.zeros_like(bot_ref[0]), bot_ref[0])
        mid = mid_ref[0]
        up = jnp.concatenate([top, mid[:-1]], axis=0)
        dn = jnp.concatenate([mid[1:], bot], axis=0)
        return mid, up, dn

    # 1. known-good pattern: plain dot
    def k1(top_ref, mid_ref, bot_ref, w_ref, out_ref):
        th, w, c = mid_ref.shape[1:]
        mid = mid_ref[0]
        y = jnp.dot(mid.reshape(th * w, c), w_ref[..., :c],
                    preferred_element_type=jnp.float32)
        out_ref[0] = y.reshape(th, w, c).astype(out_ref.dtype)

    run("1: plain dot", k1)

    # 2. + halo concat + edge zeroing
    def k2(top_ref, mid_ref, bot_ref, w_ref, out_ref):
        th, w, c = mid_ref.shape[1:]
        mid, up, dn = halo(top_ref, mid_ref, bot_ref)
        y = jnp.dot((mid + up + dn).reshape(th * w, c), w_ref[..., :c],
                    preferred_element_type=jnp.float32)
        out_ref[0] = y.reshape(th, w, c).astype(out_ref.dtype)

    run("2: halo concat + edge zero", k2)

    # 3. + two N=3C dots into f32 + lane-block fold with zero concats
    #    (everything of the sparse kernel EXCEPT the lane-select merge)
    def k3(top_ref, mid_ref, bot_ref, w_ref, out_ref):
        th, w, c = mid_ref.shape[1:]
        mid, up, dn = halo(top_ref, mid_ref, bot_ref)
        y = jnp.dot(mid.reshape(th * w, c), w_ref[...],
                    preferred_element_type=jnp.float32)
        y = y + jnp.dot((up + dn).reshape(th * w, c), w_ref[...],
                        preferred_element_type=jnp.float32)
        y = y.reshape(th, w, 3 * c)
        zc = jnp.zeros((th, 1, c), jnp.float32)
        out = (y[:, :, c:2 * c]
               + jnp.concatenate([zc, y[:, :-1, :c]], axis=1)
               + jnp.concatenate([y[:, 1:, 2 * c:], zc], axis=1))
        out_ref[0] = out.astype(out_ref.dtype)

    run("3: two dots + fold (no select)", k3)

    # 4. lane-slice concat merge of complementary halves
    def k4(top_ref, mid_ref, bot_ref, w_ref, out_ref):
        th, w, c = mid_ref.shape[1:]
        mid, up, dn = halo(top_ref, mid_ref, bot_ref)
        updn = jnp.concatenate([dn[:, :, :c // 2], up[:, :, c // 2:]],
                               axis=-1)
        y = jnp.dot(updn.reshape(th * w, c), w_ref[..., :c],
                    preferred_element_type=jnp.float32)
        out_ref[0] = y.reshape(th, w, c).astype(out_ref.dtype)

    run("4: lane-slice concat merge", k4)

    # 5. iota lane-select merge (prime suspect)
    def k5(top_ref, mid_ref, bot_ref, w_ref, out_ref):
        th, w, c = mid_ref.shape[1:]
        mid, up, dn = halo(top_ref, mid_ref, bot_ref)
        lane = jax.lax.broadcasted_iota(jnp.int32, (th, w, c), 2)
        updn = jnp.where(lane < c // 2, dn, up)
        y = jnp.dot(updn.reshape(th * w, c), w_ref[..., :c],
                    preferred_element_type=jnp.float32)
        out_ref[0] = y.reshape(th, w, c).astype(out_ref.dtype)

    run("5: iota lane select", k5)

    print("ALL STAGES COMPILED", flush=True)


if __name__ == "__main__":
    main()

"""Localize the fused-lateral kernel's hardware numerics mismatch.

tools/ab_fused_lateral.py measured max|diff| ~1e-2 vs the XLA chain on the
real v5e at the production shape, while interpret-mode tests pass. Two
hypotheses: (a) an indexing/halo logic bug that interpret mode hides, or
(b) precision policy — the TPU lowers f32 matmuls to bf16 MXU passes by
default, and the Pallas dot and the XLA conv may pick different pass
counts. (Forcing Precision.HIGHEST in-kernel measured WORSE — all rows at
bf16-level error — so the default Mosaic dot is already the close one.)

The discriminator: EXACT integer-valued data. Sparse +-1 weights, small
integer inputs, quarter-integer PReLU slopes — every candidate path
(bf16 multiply, f32 accumulate, any pass split) computes these exactly, so
a logic bug shows as a large discrete diff and a precision policy shows as
exactly 0.

Run on the TPU: python tools/debug_fused_lateral.py
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from video_layout_generation_tpu.ops.packed import (conv_packed3x3,
                                                        pack2x2,
                                                        pack_kernel3x3)
    from video_layout_generation_tpu.ops.pallas.conv_packed import (
        fused_lateral_packed3x3)

    rng = np.random.default_rng(0)
    ci = 32

    def prelu(z, a):
        return jnp.where(z >= 0, z, a * z)

    def sparse_int_kernel(seed, density=0.05):
        r = np.random.default_rng(seed)
        k = r.integers(-1, 2, (3, 3, ci, ci)).astype(np.float32)
        mask = r.random((3, 3, ci, ci)) < density
        return k * mask

    def compare(h, w, tile_h, dtype, tag):
        xs = rng.integers(-1, 2, (1, h, w, ci)).astype(np.float32)
        xs *= rng.random((1, h, w, ci)) < 0.5
        xp = pack2x2(jnp.asarray(xs)).astype(dtype)
        w0 = pack_kernel3x3(jnp.asarray(sparse_int_kernel(1)))
        w1 = pack_kernel3x3(jnp.asarray(sparse_int_kernel(2)))
        b0 = jnp.zeros(ci)
        b1 = jnp.zeros(ci)
        a0, a1 = jnp.asarray(0.25), jnp.asarray(0.5)

        @jax.jit
        def ref_fn(xp_):
            y = conv_packed3x3(prelu(xp_, a0.astype(xp_.dtype)),
                               w0.astype(xp_.dtype), b0)
            return conv_packed3x3(prelu(y, a1.astype(xp_.dtype)),
                                  w1.astype(xp_.dtype), b1)

        @jax.jit
        def ker_fn(xp_):
            return fused_lateral_packed3x3(xp_, w0, b0, a0, w1, b1, a1,
                                           None, tile_h)

        ref = np.asarray(ref_fn(xp), np.float32)
        out = np.asarray(ker_fn(xp), np.float32)
        d = np.abs(ref - out)[0]
        hp = d.shape[0]
        print(f"[{tag}] h={h} tile_h={tile_h} nj={max(hp // tile_h, 1)} "
              f"{np.dtype(dtype).name}: max {d.max():.2e} "
              f"nonzero {(d > 0).sum()}/{d.size}", flush=True)
        if d.max() > 0:
            rows = d.max(axis=(1, 2))
            bad = np.where(rows > 0)[0]
            rel = sorted(set(int(r) % tile_h for r in bad))
            print(f"    bad rows: {len(bad)}/{hp} at {bad[:12].tolist()} "
                  f"row%tile_h in {rel[:10]}", flush=True)
            cols = d.max(axis=(0, 2))
            badc = np.where(cols > 0)[0]
            print(f"    bad cols: {len(badc)}/{d.shape[1]} "
                  f"at {badc[:12].tolist()}", flush=True)
            q = d.max(axis=(0, 1)).reshape(4, ci)
            print(f"    per-quadrant max: {[f'{v:.1e}' for v in q.max(1)]}",
                  flush=True)
        return d.max()

    H = W = 256
    compare(H, W, 16, jnp.float32, tag="prod-f32-exact")
    compare(H, W, 16, jnp.bfloat16, tag="prod-bf16-exact")
    compare(64, 64, 16, jnp.float32, tag="h64-f32-exact")


if __name__ == "__main__":
    main()

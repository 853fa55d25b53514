"""Hardware A/B: fused whole-lateral Pallas kernel vs XLA paths.

One process, one compile session. Measures the FULL rollout program
(A/B discipline per BENCH_NOTES.md — isolated wins repeatedly failed to
survive XLA fusion context):

  A: row-0 1x2 width-packed executor (current default, 926 fps baseline)
  B: row-0 2x2 executor, XLA dense packed convs
  C: row-0 2x2 executor with VLG_FUSED_LATERAL=1 (whole-lateral kernel)

plus a numerics check of the fused kernel vs the XLA chain at the real
shape. Prints one line per stage; timings fetch a scalar (axon
block_until_ready is a no-op) and subtract the measured RTT.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from video_layout_generation_tpu.models import GridNet

    B, H, W, T = 128, 256, 256, 8
    model = GridNet(n_channels=8)
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, H, W, 8), jnp.float32))

    rng = np.random.default_rng(0)
    img1 = jnp.asarray(rng.random((B, H, W, 3), np.float32))
    img2 = jnp.asarray(rng.random((B, H, W, 3), np.float32))
    seg1 = jnp.asarray(rng.integers(0, 20, (B, H, W, 1)).astype(np.float32))
    seg2 = jnp.asarray(rng.integers(0, 20, (B, H, W, 1)).astype(np.float32))

    # tunnel RTT
    one = jnp.ones(())
    for _ in range(2):
        float((one + 1).sum())
    t0 = time.time()
    for _ in range(5):
        float((one + 1).sum())
    rtt = (time.time() - t0) / 5
    print(f"rtt {rtt*1000:.1f} ms", flush=True)

    # ---- numerics check at the real shape (2x2, fused vs dense) --------
    # EXACT integer-valued data: every precision path computes these
    # exactly, so the gate tests kernel LOGIC only. (Gaussian f32 data
    # shows ~1e-2 diffs that are pure precision policy — the TPU lowers
    # f32 matmuls to reduced-precision MXU passes and the Pallas dot and
    # XLA conv pick different splits; in the production bf16 dtype both
    # run the same native bf16-multiply/f32-accumulate. See
    # tools/debug_fused_lateral.py.)
    from video_layout_generation_tpu.ops.packed import (conv_packed3x3,
                                                        pack2x2,
                                                        pack_kernel3x3)
    from video_layout_generation_tpu.ops.pallas.conv_packed import (
        fused_lateral_packed3x3)
    ci = 32

    def sparse_int(seed, shape, density=0.05):
        r = np.random.default_rng(seed)
        k = r.integers(-1, 2, shape).astype(np.float32)
        return k * (r.random(shape) < density)

    xs = rng.integers(-1, 2, (2, H, W, ci)).astype(np.float32)
    xs *= rng.random((2, H, W, ci)) < 0.5
    xp = pack2x2(jnp.asarray(xs)).astype(jnp.bfloat16)
    w0 = pack_kernel3x3(jnp.asarray(sparse_int(1, (3, 3, ci, ci))))
    w1 = pack_kernel3x3(jnp.asarray(sparse_int(2, (3, 3, ci, ci))))
    b0 = jnp.zeros(ci)
    b1 = jnp.zeros(ci)
    a0, a1 = jnp.asarray(0.25), jnp.asarray(0.5)

    def prelu(z, a):
        return jnp.where(z >= 0, z, a.astype(z.dtype) * z)

    @jax.jit
    def ref_fn(xp_):
        y = conv_packed3x3(prelu(xp_, a0), w0.astype(xp_.dtype), b0)
        return conv_packed3x3(prelu(y, a1), w1.astype(xp_.dtype), b1)

    @jax.jit
    def ker_fn(xp_):
        return fused_lateral_packed3x3(xp_, w0, b0, a0, w1, b1, a1, None)

    ref = np.asarray(ref_fn(xp), np.float32)
    out = np.asarray(ker_fn(xp), np.float32)
    diff = np.abs(ref - out).max()
    print(f"fused-lateral max abs diff vs XLA (exact-int bf16, 256px): "
          f"{diff:.2e}", flush=True)
    assert diff == 0.0, "logic mismatch on hardware"

    # ---- full-program A/B ----------------------------------------------
    # env flags are read at TRACE time (first call), so set them, then
    # build AND first-call before moving to the next variant
    variants = [
        ("A_1x2_xla", {"VLG_ROW0_PACK": "1x2", "VLG_FUSED_LATERAL": None}),
        ("B_2x2_xla", {"VLG_ROW0_PACK": "2x2", "VLG_FUSED_LATERAL": None}),
        ("C_2x2_fused", {"VLG_ROW0_PACK": "2x2", "VLG_FUSED_LATERAL": "1"}),
    ]

    from video_layout_generation_tpu.models.fast_gridnet import (
        make_packed_rollout_fn)

    for tag, env in variants:
        for k, v in env.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        ro = make_packed_rollout_fn(n_frames=T, dtype=jnp.bfloat16,
                                    packing=env.get("VLG_ROW0_PACK"))
        tic = time.time()
        imgs, segs = ro(params, img1, img2, seg1, seg2)
        s = float(imgs.sum()) + float(segs.sum())
        print(f"{tag}: compile+first {time.time()-tic:.1f}s (sum {s:.1f})",
              flush=True)
        # timed reps
        reps = 3
        tic = time.time()
        for _ in range(reps):
            imgs, segs = ro(params, img1, img2, seg1, seg2)
            float(imgs[0, 0, 0, 0, 0])  # sync on a scalar fetch
        dt = (time.time() - tic) / reps - rtt
        fps = B * T / dt
        print(f"{tag}: {dt*1000:.1f} ms/rollout -> {fps:.1f} fps", flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()

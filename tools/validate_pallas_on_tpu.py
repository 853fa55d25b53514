"""Hardware validation for the Pallas kernels (run on a real chip).

Checks value parity + gradient parity of the fused InstanceNorm and SSIM
kernels against their XLA formulations on the actual TPU backend, and
prints timings. On success, flip ``losses/ssim.py::ssim_loss`` default
``use_pallas`` to True.

  python tools/validate_pallas_on_tpu.py
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

    from video_layout_generation_tpu.losses.ssim import ssim_loss
    from video_layout_generation_tpu.ops.pallas.instance_norm import (
        _tileable, _xla_instance_norm, instance_norm_pallas)
    from video_layout_generation_tpu.ops.pallas.ssim import ssim_loss_pallas

    rng = np.random.default_rng(0)

    # --- InstanceNorm ---------------------------------------------------
    x = jnp.asarray(rng.standard_normal((4, 64, 64, 256))
                    .astype(np.float32))
    assert _tileable(x.shape), 'shape must take the Pallas path'
    a = float(jax.jit(lambda v: instance_norm_pallas(v).sum())(x))
    b = float(jax.jit(lambda v: _xla_instance_norm(v, 1e-5).sum())(x))
    print(f"IN value diff: {abs(a - b):.3e}")
    ga = jax.jit(jax.grad(lambda v: (instance_norm_pallas(v) ** 2).sum()))(x)
    gb = jax.jit(jax.grad(
        lambda v: (_xla_instance_norm(v, 1e-5) ** 2).sum()))(x)
    print(f"IN grad max diff: "
          f"{float(jnp.abs(ga - gb).max()):.3e}")

    # --- SSIM -----------------------------------------------------------
    xs = jnp.asarray(np.clip(
        rng.standard_normal((8, 256, 256, 3)) * .2 + .5, 0, 1)
        .astype(np.float32))
    ys = jnp.asarray(np.clip(
        rng.standard_normal((8, 256, 256, 3)) * .2 + .5, 0, 1)
        .astype(np.float32))
    f_p = jax.jit(lambda a, b: ssim_loss_pallas(a, b))
    f_x = jax.jit(lambda a, b: ssim_loss(a, b, use_pallas=False))
    vp, vx = float(f_p(xs, ys)), float(f_x(xs, ys))
    print(f"SSIM values: pallas={vp:.6f} xla={vx:.6f} "
          f"diff={abs(vp - vx):.3e}")
    for name, f in (("pallas", f_p), ("xla", f_x)):
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(f(xs, ys))
            ts.append(time.perf_counter() - t0)
        print(f"SSIM {name}: {(min(ts) - 0.0272) * 1e3:.2f} ms")
    print("OK — if diffs are ~1e-5, flip ssim_loss use_pallas default.")


if __name__ == "__main__":
    main()

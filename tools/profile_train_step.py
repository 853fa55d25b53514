"""In-context cost map of the production TRAIN step (b16, 256px, HNED
edges, bf16, packed training forward) via graph ablations — the
profile_rollout_components.py methodology applied to fwd+bwd+Adam.

Variants (each a full jitted step; deltas vs full = in-context cost):
  full          three-term loss, HNED edges, backward, Adam
  fwd_only      loss value only (no grad, no optimizer)
  no_hned       edge channels replaced by a cheap frame-mean stand-in
                (keeps all shapes + dependencies)
  no_perceptual w_style = 0 (VGG+SSIM+gradient dropped from the graph)
  l1_only       w_style = 0 and w_seg = 0

  python tools/profile_train_step.py
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np

B, HW = 16, 256


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from video_layout_generation_tpu.losses.combined import CombinedLoss
    from video_layout_generation_tpu.models import HNED, GridNet
    from video_layout_generation_tpu.models.fast_gridnet import (
        make_packed_gridnet_apply)
    from video_layout_generation_tpu.train.state import (TrainState,
                                                         make_optimizer)
    from video_layout_generation_tpu.train.steps import (make_loss_fn,
                                                         make_train_step)

    dt = jnp.bfloat16
    model = GridNet(n_channels=10, dtype=dt)
    hned = HNED(dtype=dt)
    combined = CombinedLoss.create(dtype=dt, image_hw=(HW, HW))
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, HW, HW, 10), jnp.float32))
    hned_params = jax.jit(hned.init)(jax.random.key(1),
                                     jnp.zeros((1, HW, HW, 3), jnp.float32))
    state0 = TrainState.create(params, make_optimizer("adam", 2e-4, 0.5))
    apply = make_packed_gridnet_apply(dtype=dt, coord_in=False)

    def fake_hned(hp, x):
        # dependency-preserving edge stand-in: per-pixel frame mean,
        # same (B,H,W,1)x6 contract as HNED
        e = jnp.mean(x, axis=-1, keepdims=True)
        return (e,) * 6

    rng_np = np.random.default_rng(0)
    batch = {
        "img1": jnp.asarray(rng_np.random((B, HW, HW, 3), np.float32)),
        "img2": jnp.asarray(rng_np.random((B, HW, HW, 3), np.float32)),
        "img3": jnp.asarray(rng_np.random((B, HW, HW, 3), np.float32)),
        "seg1": jnp.asarray(
            rng_np.integers(0, 20, (B, HW, HW, 1)).astype(np.float32)),
        "seg2": jnp.asarray(
            rng_np.integers(0, 20, (B, HW, HW, 1)).astype(np.float32)),
        "seg3": jnp.asarray(
            rng_np.integers(0, 20, (B, HW, HW)).astype(np.int32)),
    }
    key = jax.random.key(2)

    one = jnp.ones(())
    for _ in range(2):
        float((one + 1).sum())
    t0 = time.time()
    for _ in range(5):
        float((one + 1).sum())
    rtt = (time.time() - t0) / 5
    print(f"rtt {rtt*1000:.1f} ms", flush=True)

    def timeit(tag, fn, *args):
        tic = time.time()
        out = fn(*args)
        # sync on any scalar leaf
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.asarray(leaf).reshape(-1)[0])
        print(f"{tag}: compile+first {time.time()-tic:.1f}s", flush=True)
        ts = []
        for _ in range(5):
            tic = time.time()
            out = fn(*args)
            leaf = jax.tree_util.tree_leaves(out)[0]
            float(jnp.asarray(leaf).reshape(-1)[0])
            ts.append(time.time() - tic)
        ms = (min(ts) - rtt) * 1000
        print(f"{tag}: {ms:.1f} ms", flush=True)
        return ms

    # dummy perceptual loss: the VGG/SSIM/gradient graph is never traced
    # (a 0.0 weight would still build it — XLA can't fold mul-by-zero
    # through potential NaN/inf)
    dummy_combined = lambda a, b: jnp.float32(0.0)

    results = {}
    variants = [
        ("full", dict(hned=hned.apply, combined=combined, w_seg=10.0,
                      grad=True)),
        ("fwd_only", dict(hned=hned.apply, combined=combined, w_seg=10.0,
                          grad=False)),
        ("no_hned", dict(hned=fake_hned, combined=combined, w_seg=10.0,
                         grad=True)),
        ("no_perceptual", dict(hned=hned.apply, combined=dummy_combined,
                               w_seg=10.0, grad=True)),
        ("l1_only", dict(hned=hned.apply, combined=dummy_combined,
                         w_seg=0.0, grad=True)),
    ]
    for tag, v in variants:
        if v["grad"]:
            step = make_train_step(apply, v["hned"], v["combined"],
                                   w_seg=v["w_seg"], donate=False)
            results[tag] = timeit(tag, step, state0, hned_params, batch,
                                  key)
        else:
            loss_fn = make_loss_fn(apply, v["combined"], 40.0, 20.0,
                                   v["w_seg"])
            from video_layout_generation_tpu.train.steps import (
                decode_batch, prepare_inputs)

            def fwd(p, hp, b):
                b = decode_batch(b)
                x, f3n = prepare_inputs(v["hned"], hp, b)
                loss, _ = loss_fn(p, x, f3n, b["seg3"])
                return loss
            results[tag] = timeit(tag, jax.jit(fwd), state0.params,
                                  hned_params, batch)

    full = results["full"]
    print(f"\nbackward+optimizer: {full - results['fwd_only']:.1f} ms "
          f"({100*(full-results['fwd_only'])/full:.0f}%)")
    print(f"HNED edges (in-context): {full - results['no_hned']:.1f} ms")
    print(f"perceptual loss (VGG+SSIM+grad, incl. its backward): "
          f"{full - results['no_perceptual']:.1f} ms")
    print(f"seg-CE + perceptual: {full - results['l1_only']:.1f} ms")


if __name__ == "__main__":
    main()

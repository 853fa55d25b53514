"""Training wall-clock: host-loader pipeline vs on-device rendering.

Runs the production train config (256px, b16, HNED edges, bf16, packed
executors) for a few epochs with the standard host pipeline
(packed-uint8 upload) and with ``device_data=True`` (batches rendered
on-device; per step only a (B,) int32 index ships), and reports
steady-state wall-clock per step for each. On tunneled/remote devices the
difference is the entire H2D batch transfer.

  timeout 580 python tools/bench_device_data.py [--epochs 3]
"""

from __future__ import annotations

import argparse
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def run(device_data: bool, args, epoch_scan: bool = False):
    import jax
    from video_layout_generation_tpu.config import Config
    from video_layout_generation_tpu.train import Trainer

    cfg = Config(dataset="synthetic", synthetic_train_size=args.train_size,
                 synthetic_val_size=8, image_size=(args.size, args.size),
                 batch_size=args.bs, epochs=args.epochs, edge=True,
                 arch="GridNet", compute_dtype="bfloat16", workers=4,
                 print_freq=1000,
                 path=f"/tmp/vlg_devdata_{device_data}_{epoch_scan}",
                 mesh_shape=(1,), device_data=device_data,
                 epoch_scan=epoch_scan,
                 hed_weights=args.hed_weights, vgg_weights=args.vgg_weights)
    t = Trainer(cfg)
    walls = []
    for e in range(args.epochs):
        t.set_epoch(e)
        t0 = time.time()
        t.train()
        # sync: fetch a param scalar so every dispatched step finished
        s = t.state.params
        leaf = jax.tree_util.tree_leaves(s)[0]
        float(leaf.sum())
        walls.append(time.time() - t0)
    n_steps = len(t.train_loader)
    label = ("epoch-scan" if epoch_scan
             else "device-render" if device_data else "host-pipeline")
    print(f"{label}: epochs {[round(w, 2) for w in walls]} s "
          f"({n_steps} steps/epoch); steady-state "
          f"{min(walls[1:]) / n_steps * 1e3:.1f} ms/step")
    return min(walls[1:]) / n_steps


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--bs", type=int, default=16)
    p.add_argument("--train_size", type=int, default=256)
    p.add_argument("--hed_weights", default="artifacts/hned_synth.npz")
    p.add_argument("--vgg_weights", default="artifacts/vgg_synth.npz")
    args = p.parse_args(argv)

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    host = run(False, args)
    dev = run(True, args)
    scan = run(True, args, epoch_scan=True)
    print(f"device-render speedup {host / dev:.2f}x, epoch-scan speedup "
          f"{host / scan:.2f}x (wall/step {host * 1e3:.1f} -> "
          f"{dev * 1e3:.1f} -> {scan * 1e3:.1f} ms)")


if __name__ == "__main__":
    main()

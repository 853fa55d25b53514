"""End-to-end product-loop demo: checkpoint -> rollout -> colorized PNGs.

Loads a trained flagship checkpoint (warm-start path, reference --ckpt
semantics), runs the autoregressive rollout on held-out synthetic seeds,
and exports every frame of the generated layout sequence as colorized
PNGs through the native writer — the full train->generate->export loop a
reference user gets from src/trainer.py:459-469 + src/val.py:172-187.

  python tools/demo_export.py --ckpt /tmp/vlg_conv48/checkpoint/latest \
      [--out /tmp/vlg_demo_export] [--frames 8] [--seqs 2]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import glob
import os
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--out", default="/tmp/vlg_demo_export")
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--seqs", type=int, default=2)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--arch", default="GridNet")
    p.add_argument("--no_edge", dest="edge", action="store_false")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from video_layout_generation_tpu.config import Config
    from video_layout_generation_tpu.data.synthetic import SyntheticTriplets
    from video_layout_generation_tpu.evaluation.export import (
        save_colorized_png)
    from video_layout_generation_tpu.train import Trainer

    hw = (args.size, args.size)
    cfg = Config(dataset="synthetic", synthetic_train_size=8,
                 synthetic_val_size=8, image_size=hw, batch_size=8,
                 epochs=1, edge=args.edge, arch=args.arch,
                 compute_dtype="bfloat16", workers=2, path=args.out,
                 mesh_shape=(1,), rollout_frames=args.frames,
                 ckpt=args.ckpt)
    t = Trainer(cfg)

    ds = SyntheticTriplets(max(args.seqs, 2), hw, cfg.n_classes, seed=777)
    samples = [ds[i] for i in range(args.seqs)]
    stack = lambda k: jnp.stack([np.asarray(s[k]) for s in samples])
    t0 = time.time()
    imgs, segs = t.generate_sequence(stack("img1"), stack("img2"),
                                     stack("seg1"), stack("seg2"),
                                     save=True)
    print(f"rollout {tuple(imgs.shape)} in {time.time() - t0:.1f}s",
          flush=True)

    frames_dir = os.path.join(args.out, "frames")
    os.makedirs(frames_dir, exist_ok=True)
    seg_np = np.asarray(segs)
    for b in range(seg_np.shape[0]):
        for f in range(seg_np.shape[1]):
            ids = seg_np[b, f].squeeze().astype(np.int32)
            save_colorized_png(
                os.path.join(frames_dir, f"seq{b}_t{f:02d}.png"), ids)
    files = sorted(glob.glob(frames_dir + "/*.png"))
    classes = [int(len(np.unique(seg_np[0, f])))
               for f in range(seg_np.shape[1])]
    print(f"exported {len(files)} PNGs to {frames_dir}; "
          f"classes per generated frame (seq0): {classes}", flush=True)
    assert all(c > 1 for c in classes), "constant (collapsed) output"


if __name__ == "__main__":
    main()

"""Quality A/B of the rollout_upsample knob on a trained model.

Loads a trained no-edge GridNet checkpoint and scores the packed rollout's
per-step layout fidelity (mIoU vs ground-truth futures) under
rollout_upsample='bilinear' (exact reference math) vs 'nearest' (the +20%
fps opt-in). Quantifies what the approximation costs.

  python tools/fidelity_upsample_ab.py --ckpt /tmp/vlg_conv_noedge/checkpoint/latest
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--n", type=int, default=8)
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from video_layout_generation_tpu.config import Config
    from video_layout_generation_tpu.data.synthetic import SyntheticTriplets
    from video_layout_generation_tpu.evaluation import (
        evaluate_trainer_rollout)
    from video_layout_generation_tpu.train import Trainer

    ds = SyntheticTriplets(args.n, (args.size, args.size), 20, seed=4242)
    out = {}
    for mode in ("bilinear", "nearest"):
        cfg = Config(dataset="synthetic", synthetic_train_size=8,
                     synthetic_val_size=4,
                     image_size=(args.size, args.size), batch_size=4,
                     epochs=0, edge=False, arch="GridNet",
                     compute_dtype="bfloat16", workers=0, path=None,
                     mesh_shape=(1,), rollout_frames=8, ckpt=args.ckpt,
                     rollout_upsample=mode)
        t = Trainer(cfg)
        fid = evaluate_trainer_rollout(t, ds, list(range(args.n)),
                                       n_frames=8)
        vals = [round(float(v), 4) for v in fid["per_step_miou"]]
        out[mode] = vals
        print(f"{mode}: per-step mIoU {vals} "
              f"(mean {sum(vals)/len(vals):.4f})", flush=True)
    return out


if __name__ == "__main__":
    main()

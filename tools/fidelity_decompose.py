"""Decompose rollout-fidelity decay into its feedback channels.

The 8-step rollout feeds back BOTH a predicted frame and a predicted
layout (reference loop: /root/reference/src/trainer.py:459-469). This
tool scores per-step mIoU under four feedback regimes from the same
checkpoint and held-out scenes:

  rollout  — both channels predicted (the real rollout; the campaign curve)
  teacher  — both channels ground truth (intrinsic per-step difficulty;
             flat curve == all decay is compounding feedback error)
  gt_img   — GT frames, predicted layouts (isolates layout-channel drift)
  gt_seg   — predicted frames, GT layouts (isolates image-channel drift)

Whichever mixed regime recovers more of the teacher curve names the
channel driving the decay — that's the lever the fidelity campaign
should push next (image-head quality vs layout-head quality).

  python tools/fidelity_decompose.py --ckpt artifacts/flagship/checkpoint/096 \
      --hed_weights artifacts/hned_synth.npz [--size 256] [--n 8]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True,
                   help="flagship checkpoint dir (weights-only load)")
    p.add_argument("--hed_weights", default="artifacts/hned_synth.npz")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--n", type=int, default=8, help="held-out scenes")
    p.add_argument("--n_frames", type=int, default=8)
    p.add_argument("--arch", default="GridNet")
    args = p.parse_args(argv)

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    import numpy as np

    from video_layout_generation_tpu.config import Config
    from video_layout_generation_tpu.data.synthetic import SyntheticTriplets
    from video_layout_generation_tpu.evaluation.sequence import (
        rollout_fidelity)
    from video_layout_generation_tpu.train import Trainer
    from video_layout_generation_tpu.train.assemble import (
        assemble_model_input, denormalize_image, normalize_image,
        normalize_model_output)

    cfg = Config(dataset="synthetic", synthetic_train_size=8,
                 synthetic_val_size=8, image_size=(args.size, args.size),
                 batch_size=args.n, epochs=0, edge=True, arch=args.arch,
                 compute_dtype="bfloat16", workers=0,
                 path="/tmp/fidelity_decompose", mesh_shape=(1,),
                 hed_weights=args.hed_weights, ckpt=args.ckpt)
    t = Trainer(cfg)
    params, hned_params = t.state.params, t.hned_params
    model_apply, hned_apply = t.model.apply, t.hned.apply

    @jax.jit
    def one_step(f_old, f_new, s_old, s_new):
        e_old = hned_apply(hned_params, denormalize_image(f_old))[-1]
        e_new = hned_apply(hned_params, denormalize_image(f_new))[-1]
        x = assemble_model_input(s_old, f_old, f_new, s_new, e_old, e_new)
        seg_logits, img = model_apply(params, x)
        img_n = normalize_model_output(img)
        seg = jnp.argmax(seg_logits, axis=-1)[..., None].astype(jnp.float32)
        return img_n, seg

    # held-out scenes, same generator/seed family as the campaign eval
    ds = SyntheticTriplets(args.n, cfg.image_size, cfg.n_classes, seed=4242)
    T = args.n_frames
    imgs, segs = [], []
    for i in range(args.n):
        im, sg = ds.sequence(i, T + 2)
        imgs.append(im)
        segs.append(sg)
    gt_f = normalize_image(jnp.asarray(np.stack(imgs)))      # (N,T+2,H,W,3)
    gt_s_ids = np.stack(segs)                                 # (N,T+2,H,W)
    gt_s = jnp.asarray(gt_s_ids, jnp.float32)[..., None]      # (N,T+2,H,W,1)

    def run(regime):
        f_old, f_new = gt_f[:, 0], gt_f[:, 1]
        s_old, s_new = gt_s[:, 0], gt_s[:, 1]
        preds = []
        for k in range(T):
            img_p, seg_p = one_step(f_old, f_new, s_old, s_new)
            preds.append(np.asarray(seg_p))
            feed_f = gt_f[:, k + 2] if regime in ("teacher", "gt_img") \
                else img_p
            feed_s = gt_s[:, k + 2] if regime in ("teacher", "gt_seg") \
                else seg_p
            f_old, f_new = (gt_f[:, k + 1], feed_f) \
                if regime in ("teacher", "gt_img") else (f_new, feed_f)
            s_old, s_new = (gt_s[:, k + 1], feed_s) \
                if regime in ("teacher", "gt_seg") else (s_new, feed_s)
        pred = np.stack(preds, axis=1)                        # (N,T,H,W,1)
        fid = rollout_fidelity(pred, gt_s_ids[:, 2:], cfg.n_classes)
        return fid

    print(f"ckpt={args.ckpt} size={args.size} n={args.n} T={T}")
    results = {}
    for regime in ("rollout", "teacher", "gt_img", "gt_seg"):
        fid = run(regime)
        curve = [round(float(v), 4) for v in fid["per_step_miou"]]
        results[regime] = (curve, round(fid["mean_miou"], 4))
        print(f"{regime:8s} mean {fid['mean_miou']:.4f}  per-step {curve}")
    return results


if __name__ == "__main__":
    main()

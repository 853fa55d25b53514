"""Multi-epoch convergence for the layout-only families (VAE/CVAE/ConvLSTM).

The layout families (models/vae.py, models/convlstm.py + train/layout_trainer)
cover BASELINE.json configs 1-3 — layout prediction without the RGB stream.
Round-1/2 evidence for them was 1-epoch hardware smokes; this drives each
family for N epochs on the synthetic moving-layout dataset and prints the
per-epoch val mIoU / pixel-accuracy table, the same convergence record the
flagship Trainer has (BENCH_NOTES.md).

  python tools/layout_convergence.py [--families cvae convlstm vae]
                                     [--epochs 12] [--size 128] [--bs 16]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import argparse
import json
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--families", nargs="+",
                   default=["cvae", "convlstm", "vae"])
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--bs", type=int, default=16)
    p.add_argument("--train_size", type=int, default=256)
    p.add_argument("--val_size", type=int, default=64)
    p.add_argument("--path", default="/tmp/vlg_layout_convergence")
    p.add_argument("--lr", type=float, default=1e-3,
                   help="these small layout models train on few steps; the "
                        "flagship default 2e-4 plateaus at the majority "
                        "class within short runs")
    p.add_argument("--latent", type=int, default=32)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--beta_max", type=float, default=0.05,
                   help="KL weight ceiling. At 1.0 these small decoders hit "
                        "full posterior collapse (kl -> 0, constant "
                        "majority-class output) on the synthetic scenes")
    p.add_argument("--kl_warmup", type=int, default=500)
    p.add_argument("--free_bits", type=float, default=0.0,
                   help="per-dim KL floor (vae family; losses/vae.py)")
    p.add_argument("--kl_cycle", type=int, default=0,
                   help="cyclical beta annealing period in steps (0 = "
                        "linear warmup)")
    p.add_argument("--capacity_max", type=float, default=0.0,
                   help="Burgess capacity target C_max in nats (0 = off)")
    p.add_argument("--capacity_steps", type=int, default=1000)
    p.add_argument("--vae_widths", type=int, nargs="+", default=None,
                   help="encoder widths for the vae family (decoder is "
                        "mirrored); default 32 64 128")
    p.add_argument("--dec_refines", type=int, default=1,
                   help="refine convs per decoder upsample stage (vae)")
    p.add_argument("--bg_weight", type=float, default=1.0,
                   help="recon-CE weight for class 0 (vae family; < 1 "
                        "rebalances the ~88%%-background gradient)")
    p.add_argument("--multistep_k", type=int, default=1,
                   help="K-step exposure training for cvae/convlstm "
                        "(train/vae_steps.py): steps > 0 see the model's "
                        "own fed-back argmax prediction as context; 1 = "
                        "the plain single-step objective")
    p.add_argument("--multistep_layout_noise", type=float, default=0.0,
                   help="p of corrupting each fed-back layout pixel "
                        "(multistep_k > 1 only)")
    p.add_argument("--ckpt", default=None,
                   help="weights-only warm start (objective-switch "
                        "recipe; pair with --lr 5e-5)")
    p.add_argument("--rollout_frames", type=int, default=8,
                   help="autoregressive steps for the fidelity eval (and "
                        "the CVAE prior-sample scan length)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU platform (the session env pins the "
                        "tunneled TPU; env JAX_PLATFORMS alone is not "
                        "honored here)")
    args = p.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from video_layout_generation_tpu.config import Config
    from video_layout_generation_tpu.train.layout_trainer import LayoutTrainer

    results = {}
    for family in args.families:
        cfg = Config(dataset="synthetic",
                     synthetic_train_size=args.train_size,
                     synthetic_val_size=args.val_size,
                     image_size=(args.size, args.size),
                     batch_size=args.bs, epochs=args.epochs, lr=args.lr,
                     rollout_frames=args.rollout_frames,
                     compute_dtype="bfloat16", workers=4,
                     path=_os.path.join(args.path, family),
                     mesh_shape=(1,),
                     multistep_k=(args.multistep_k
                                  if family != "vae" else 1),
                     multistep_layout_noise=args.multistep_layout_noise,
                     ckpt=args.ckpt)
        t = LayoutTrainer(cfg, family=family,
                          latent_dim=args.latent, hidden=args.hidden,
                          kl_warmup_steps=args.kl_warmup,
                          beta_max=args.beta_max,
                          free_bits=args.free_bits,
                          kl_cycle_steps=args.kl_cycle,
                          capacity_max=args.capacity_max,
                          capacity_steps=args.capacity_steps,
                          bg_weight=args.bg_weight,
                          vae_widths=args.vae_widths,
                          dec_refines=args.dec_refines)
        rows = []
        t0 = time.time()
        for epoch in range(args.epochs):
            tr = t.train_epoch()
            val = t.validate()
            rows.append({"epoch": epoch + 1,
                         **{k: round(float(v), 4) for k, v in tr.items()},
                         "miou": round(float(val["miou"]), 4),
                         "pixel_acc": round(float(val["pixel_acc"]), 4)})
            print(json.dumps({"family": family, **rows[-1]}), flush=True)
        results[family] = {"rows": rows,
                           "wall_s": round(time.time() - t0, 1)}
        if t.ckpt is not None:
            t.ckpt.save(t.epoch, t.state.params, t.state.opt_state,
                        t.global_step, f"layout_{family}")
        if family in ("cvae", "convlstm"):
            # autoregressive rollout fidelity vs GT futures, the
            # layout-family counterpart of the flagship metric
            from video_layout_generation_tpu.data.synthetic import (
                SyntheticTriplets)
            from video_layout_generation_tpu.evaluation import (
                evaluate_layout_rollout)
            ds = SyntheticTriplets(size=16, image_hw=cfg.image_size,
                                   seed=cfg.seed + 7)
            fid = evaluate_layout_rollout(t, ds, range(16),
                                          n_frames=args.rollout_frames)
            results[family]["rollout_per_step_miou"] = [
                round(float(v), 4) for v in fid["per_step_miou"]]
            print(json.dumps({"family": family, "rollout_fidelity":
                              results[family]["rollout_per_step_miou"]}),
                  flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()

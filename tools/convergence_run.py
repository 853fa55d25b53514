"""Synthetic convergence demonstration on real hardware.

Trains the full production config (HNED edges, bf16, packed executor) on
the synthetic moving-layout dataset, where the next frame is exactly
linearly predictable — validation mIoU should climb well above the random
baseline within a few epochs, demonstrating the whole system learns.

  python tools/convergence_run.py [--epochs 4] [--size 256] [--bs 16]

Writes metrics to <path>/experiment.log and prints the final dict.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--bs", type=int, default=16)
    p.add_argument("--train_size", type=int, default=512)
    p.add_argument("--val_size", type=int, default=64)
    p.add_argument("--arch", default="GridNet")
    p.add_argument("--path", default="/tmp/vlg_convergence")
    p.add_argument("--no_edge", dest="edge", action="store_false")
    p.add_argument("--hed_weights", default=None,
                   help="pretrained HNED artifact (tools/pretrain_hned.py)")
    p.add_argument("--vgg_weights", default=None,
                   help="pretrained VGG artifact (tools/pretrain_vgg.py)")
    p.add_argument("--resume", default=None,
                   help='checkpoint to resume from ("latest" for the '
                        "newest in <path>/checkpoint)")
    p.add_argument("--multistep_k", type=int, default=1,
                   help="train on K autoregressive steps (BPTT; 1 = "
                        "reference objective)")
    p.add_argument("--ckpt", default=None,
                   help="warm-start WEIGHTS only (fresh optimizer/epoch) — "
                        "use when switching objectives, e.g. multistep "
                        "finetunes: resumed Adam moments are calibrated to "
                        "the old gradient scale and diverge")
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--multistep_discount", type=float, default=1.0,
                   help="per-step loss weight discount**(K-1-i) inside the "
                        "K-step objective (< 1 up-weights late steps)")
    p.add_argument("--multistep_feedback_noise", type=float, default=0.0,
                   help="sigma of Gaussian noise on the fed-back frame")
    p.add_argument("--multistep_layout_noise", type=float, default=0.0,
                   help="p of corrupting each fed-back layout pixel")
    p.add_argument("--multistep_image_weight", type=float, default=1.0,
                   help="scale on image terms (l1+style) vs seg in the "
                        "K-step loss, renormalized")
    p.add_argument("--multistep_image_discount", type=float, default=1.0,
                   help="per-step image-term weight g**i (< 1 up-weights "
                        "early steps' image fidelity)")
    p.add_argument("--scheduled_sampling", type=float, default=0.0,
                   help="scheduled-sampling probability (single-step only)")
    p.add_argument("--scheduled_ramp", type=int, default=0,
                   help="epochs to ramp scheduled_sampling from 0")
    p.add_argument("--chunk_steps", type=int, default=0,
                   help="host-fed chunked dispatch: K steps per program")
    p.add_argument("--device_data", action="store_true", default=False,
                   help="render training batches ON device (zero per-step "
                        "H2D traffic; the cure for bandwidth-starved "
                        "tunnels; synthetic only)")
    p.add_argument("--epoch_scan", action="store_true", default=False,
                   help="with --device_data: one compiled scan per epoch")
    p.add_argument("--fidelity_every", type=int, default=0,
                   help="log held-out per-step rollout mIoU every N epochs")
    args = p.parse_args(argv)

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    from video_layout_generation_tpu.config import Config
    from video_layout_generation_tpu.train import Trainer

    cfg = Config(dataset="synthetic", synthetic_train_size=args.train_size,
                 synthetic_val_size=args.val_size,
                 image_size=(args.size, args.size), batch_size=args.bs,
                 epochs=args.epochs, edge=args.edge, arch=args.arch,
                 compute_dtype="bfloat16", workers=4, print_freq=8,
                 path=args.path, mesh_shape=(1,), rollout_frames=8,
                 hed_weights=args.hed_weights, vgg_weights=args.vgg_weights,
                 resume=args.resume, multistep_k=args.multistep_k,
                 ckpt=args.ckpt, lr=args.lr,
                 multistep_discount=args.multistep_discount,
                 multistep_feedback_noise=args.multistep_feedback_noise,
                 multistep_layout_noise=args.multistep_layout_noise,
                 multistep_image_weight=args.multistep_image_weight,
                 multistep_image_discount=args.multistep_image_discount,
                 scheduled_sampling=args.scheduled_sampling,
                 scheduled_ramp=args.scheduled_ramp,
                 chunk_steps=args.chunk_steps,
                 device_data=args.device_data, epoch_scan=args.epoch_scan,
                 rollout_fidelity_every=args.fidelity_every)
    t = Trainer(cfg)
    m = t.fit()
    out = {k: round(float(v), 4) for k, v in m.items()
           if not hasattr(v, "shape")}
    print("FINAL:", out)

    # rollout fidelity on held-out scenes
    from video_layout_generation_tpu.data.synthetic import SyntheticTriplets
    from video_layout_generation_tpu.evaluation import (
        evaluate_trainer_rollout)
    ds = SyntheticTriplets(8, cfg.image_size, cfg.n_classes, seed=4242)
    fid = evaluate_trainer_rollout(t, ds, list(range(8)), n_frames=8)
    print("ROLLOUT FIDELITY per-step mIoU:",
          [round(float(v), 4) for v in fid["per_step_miou"]])
    return out


if __name__ == "__main__":
    main()

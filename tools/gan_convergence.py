"""Multi-epoch adversarial (GAN) convergence demonstration on real hardware.

The reference's conditional-GAN path is fully written but commented out
(src/trainer.py:219-246) with the complete flag surface (src/main.py:147-158).
This drives the rebuild's fused alternating G/D step for >=10 epochs on the
synthetic moving-layout dataset and prints the per-epoch G/D loss table —
the convergence evidence VERDICT round-1 asked for: stable G/D curves, no
mode collapse (D loss should hover near the lsgan equilibrium ~0.25, G's
adversarial term should stay bounded while the reconstruction terms fall).

  python tools/gan_convergence.py [--epochs 12] [--size 128] [--bs 8]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--bs", type=int, default=8)
    p.add_argument("--train_size", type=int, default=128)
    p.add_argument("--val_size", type=int, default=32)
    p.add_argument("--gan_mode", default="lsgan",
                   choices=("lsgan", "vanilla", "wgangp"))
    p.add_argument("--netD", default="n_layers")
    p.add_argument("--norm", default="instance")
    p.add_argument("--path", default="/tmp/vlg_gan_convergence")
    p.add_argument("--hed_weights", default=None)
    p.add_argument("--vgg_weights", default=None)
    p.add_argument("--no_gan", dest="gan", action="store_false",
                   help="matched-compute control: identical run with the "
                        "adversarial term off (VERDICT r2 #7 — does the GAN "
                        "term help or harm val mIoU?)")
    args = p.parse_args(argv)

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from video_layout_generation_tpu.config import Config
    from video_layout_generation_tpu.train import Trainer

    cfg = Config(dataset="synthetic", synthetic_train_size=args.train_size,
                 synthetic_val_size=args.val_size,
                 image_size=(args.size, args.size), batch_size=args.bs,
                 epochs=args.epochs, edge=True, arch="GridNet",
                 gan_train=args.gan, gan_mode=args.gan_mode, netD=args.netD,
                 norm=args.norm, compute_dtype="bfloat16", workers=4,
                 print_freq=8, path=args.path, mesh_shape=(1,),
                 hed_weights=args.hed_weights, vgg_weights=args.vgg_weights)
    t = Trainer(cfg)

    rows = []
    for epoch in range(args.epochs):  # fit()'s epoch convention
        t.set_epoch(epoch)
        # manual epoch loop: accumulate the full G/D metric set (the Trainer
        # logs them to TB; the table here is the convergence record)
        sums, n = {}, 0
        for i, batch in enumerate(t.train_loader):
            t.global_step += 1
            rng = jax.random.fold_in(jax.random.key(cfg.seed),
                                     t.global_step)
            t.state, metrics = t._train_step(t.state, t.hned_params, batch,
                                             rng)
            if i % 4 == 0 or i == len(t.train_loader) - 1:
                # sync + accumulate on a subsample (host fetch per step
                # would serialize the dispatch chain)
                for k, v in metrics.items():
                    sums[k] = sums.get(k, 0.0) + float(v)
                n += 1
        val = t.validate()
        row = {k: sums[k] / n for k in sums}
        row.update(val_loss=float(val["loss"]), miou=float(val["miou"]))
        rows.append(row)
        if args.gan:
            print(f"epoch {epoch + 1:2d}: G {row['loss']:.2f} "
                  f"(gan {row['loss_gan']:.3f} l1 {row['loss_l1']:.2f} "
                  f"style {row['loss_style']:.2f} seg {row['loss_seg']:.2f}) "
                  f"D {row['loss_d']:.4f} "
                  f"(fake {row['loss_d_fake']:.4f} "
                  f"real {row['loss_d_real']:.4f}) "
                  f"val {row['val_loss']:.2f} mIoU {row['miou']:.3f}",
                  flush=True)
        else:
            print(f"epoch {epoch + 1:2d}: loss {row['loss']:.2f} "
                  f"val {row['val_loss']:.2f} mIoU {row['miou']:.3f}",
                  flush=True)
    t.save_checkpoint()

    if args.gan:
        d = [r["loss_d"] for r in rows]
        g = [r["loss_gan"] for r in rows]
        print(f"D loss range over run: [{min(d):.4f}, {max(d):.4f}]; "
              f"G adv range: [{min(g):.4f}, {max(g):.4f}]")
        print(f"recon (l1+style+seg) first->last: "
              f"{rows[0]['loss'] - rows[0]['loss_gan']:.2f} -> "
              f"{rows[-1]['loss'] - rows[-1]['loss_gan']:.2f}")
    print("PER-EPOCH mIoU:", [round(r["miou"], 4) for r in rows])
    return rows


if __name__ == "__main__":
    main()

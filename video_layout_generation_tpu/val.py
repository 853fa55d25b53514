"""Standalone layout-completion evaluation CLI.

Capability parity with the legacy ``val.py`` (src/val.py): load a masked
layout-completion model (u_net | encoder_decoder), run a batched eval loop,
argmax the predicted layouts, colorize via the palette LUT, save per-image
PNGs, and print per-image eval/draw/save timing. The reference's version
imports modules missing from its repo (src/val.py:16-21) and therefore
cannot run; this one is self-contained:

- input data comes from an ``--data`` .npz with arrays ``imgs (N,H,W,3)``,
  ``segs (N,H,W)``, ``masks (N,H,W)`` (the legacy array contract documented
  at reference src/data.py:14-27), or from a synthetic masked-layout set
  when omitted;
- per-class IoU + pixel accuracy are computed over the run (the north-star
  metric BASELINE.json adds over the reference).

Usage:
  python -m video_layout_generation_tpu.val --model u_net --bs 4 \
      [--data arrays.npz] [--ckpt <orbax dir>] [--save_dir results]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Evaluate a segmentation completion network")
    p.add_argument("--dataset", choices=["cityscape", "synthetic"],
                   default="synthetic")
    p.add_argument("--model", choices=["u_net", "encoder_decoder"],
                   default="u_net")
    p.add_argument("--data", type=str, default=None,
                   help="npz with imgs/segs/masks arrays")
    p.add_argument("--load_dir", type=str, default="models",
                   help="directory a relative --ckpt is resolved under")
    p.add_argument("--save_dir", type=str, default="results")
    p.add_argument("--ckpt", type=str, default=None,
                   help="orbax checkpoint dir with completion-model params")
    p.add_argument("--nw", dest="num_workers", type=int, default=0,
                   help="threads for the PNG export")
    p.add_argument("--bs", dest="batch_size", type=int, default=1)
    p.add_argument("--n_classes", type=int, default=29)
    p.add_argument("--size", type=int, nargs="+", default=[256],
                   help="synthetic eval resolution: SIZE or H W (the "
                        "reference's eval contract is 1024 2048, "
                        "src/val.py:176)")
    p.add_argument("--n_samples", type=int, default=8,
                   help="synthetic sample count")
    p.add_argument("--embedding_dim", type=int, default=15)
    p.add_argument("--data_parallel", action="store_true",
                   help="shard each eval batch over all devices (the "
                        "reference's optional nn.DataParallel, "
                        "src/val.py:130-131)")
    return p.parse_args(argv)


def _synthetic_arrays(n, shape, n_classes, seed=0):
    hh, ww = shape
    rng = np.random.default_rng(seed)
    segs = np.zeros((n, hh, ww), np.int32)
    for i in range(n):
        for _ in range(5):
            c = int(rng.integers(0, n_classes))
            y0 = int(rng.integers(0, hh - 8))
            x0 = int(rng.integers(0, ww - 8))
            h = int(rng.integers(8, hh // 2))
            w = int(rng.integers(8, ww // 2))
            segs[i, y0:y0 + h, x0:x0 + w] = c
    imgs = rng.random((n, hh, ww, 3)).astype(np.float32)
    masks = np.zeros((n, hh, ww), np.float32)
    for i in range(n):
        y0 = int(rng.integers(hh // 4, hh // 2))
        x0 = int(rng.integers(ww // 4, ww // 2))
        masks[i, y0:y0 + hh // 4, x0:x0 + ww // 4] = 1.0
    return imgs, segs, masks


def main(argv=None):
    args = parse_args(argv)
    print("Called with args:")
    print(args)

    import jax
    import jax.numpy as jnp

    from .evaluation.export import save_colorized_png
    from .evaluation.metrics import confusion_matrix, summarize_confusion
    from .models.legacy import Simple

    size = tuple(args.size) if len(args.size) == 2 else (args.size[0],) * 2
    if args.data:
        raw = np.load(args.data)
        imgs, segs, masks = (np.asarray(raw["imgs"], np.float32),
                             np.asarray(raw["segs"], np.int32),
                             np.asarray(raw["masks"], np.float32))
    else:
        imgs, segs, masks = _synthetic_arrays(args.n_samples, size,
                                              args.n_classes)
    n = imgs.shape[0]
    if n % args.batch_size != 0:
        raise SystemExit(
            f"batch size must divide val size ({n})")

    model = Simple(args.n_classes, args.embedding_dim, args.model)
    b0 = (jnp.asarray(masks[:args.batch_size]),
          jnp.asarray(segs[:args.batch_size]),
          jnp.asarray(imgs[:args.batch_size]))
    params = jax.jit(model.init)(jax.random.key(0), *b0)
    if args.ckpt:
        import orbax.checkpoint as ocp
        ckpt = args.ckpt
        if not os.path.isabs(ckpt) and not os.path.exists(ckpt):
            ckpt = os.path.join(args.load_dir, ckpt)
        params = {"params": ocp.PyTreeCheckpointer().restore(
            os.path.abspath(ckpt))["params"]}

    apply_fn = jax.jit(lambda p, m, s, i: jnp.argmax(
        model.apply(p, m, s, i), axis=-1))

    put = jnp.asarray
    if args.data_parallel:
        from .parallel.mesh import (batch_sharding, make_mesh,
                                    replicated_sharding)
        mesh = make_mesh()
        if args.batch_size % mesh.size != 0:
            raise SystemExit(f"batch size {args.batch_size} must be "
                             f"divisible by the device count {mesh.size}")
        params = jax.device_put(params, replicated_sharding(mesh))
        # device_put the host array with the sharding directly: going
        # through jnp.asarray first would stage the full batch on device 0
        # and reshard, doubling the upload
        sh = batch_sharding(mesh)
        put = lambda x: jax.device_put(x, sh)

    save_folder = os.path.join(args.save_dir,
                               f"{args.model}_eval_{size[0]}x{size[1]}")
    os.makedirs(save_folder, exist_ok=True)

    print("evaluation start")
    sys.stdout.flush()
    import concurrent.futures as cf
    pool = (cf.ThreadPoolExecutor(args.num_workers)
            if args.num_workers > 0 else None)
    cm_total = None
    img_count = 0
    for step in range(n // args.batch_size):
        sl = slice(step * args.batch_size, (step + 1) * args.batch_size)
        tic = time.time()
        pred = apply_fn(params, put(masks[sl]),
                        put(segs[sl]), put(imgs[sl]))
        pred_np = np.asarray(pred)
        # full-resolution output contract (reference src/val.py:176
        # asserts [bs, 1024, 2048])
        assert pred_np.shape == segs[sl].shape, pred_np.shape
        eval_time = time.time() - tic

        tic = time.time()
        cm = confusion_matrix(pred, jnp.asarray(segs[sl]), args.n_classes)
        cm_total = cm if cm_total is None else cm_total + cm
        draw_time = time.time() - tic

        tic = time.time()
        paths = [os.path.join(save_folder, f"{img_count + i}.png")
                 for i in range(args.batch_size)]
        if pool is not None:
            list(pool.map(save_colorized_png, paths, pred_np))
        else:
            for path, pr in zip(paths, pred_np):
                save_colorized_png(path, pr)
        img_count += args.batch_size
        save_time = time.time() - tic
        sys.stdout.write(
            "\rsaving image {}/{} \ttime cost: {:.2f}\teval cost: {:.2f}"
            .format(img_count, n, eval_time + draw_time + save_time,
                    eval_time))
        sys.stdout.flush()

    if pool is not None:
        pool.shutdown()
    iou, miou, acc = summarize_confusion(cm_total, args.n_classes)
    print("\nper-class IoU:",
          " ".join("%.3f" % v if np.isfinite(v) else "nan" for v in iou))
    print(f"mIoU: {miou:.4f}  pixel-acc: {acc:.4f}")


if __name__ == "__main__":
    main()

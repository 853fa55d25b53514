"""Pretrain HNED as a real edge detector and export the weight artifact.

The reference's frozen HED checkpoint cannot be fetched in this environment
(zero egress; see DEVIATIONS.md). This produces the capability-equivalent
artifact in-repo: HNED is trained with the classic HED objective
(class-balanced BCE on all five side outputs + the fused output —
Xie & Tu 2015, the training recipe behind the reference's checkpoint) on
synthetic scenes whose ground-truth edges are analytically known (layout
region boundaries). The result is a genuine edge detector in the exact
tensor format the framework's `--hed_weights` consumes, so a converted real
HED checkpoint remains a drop-in replacement.

  python tools/pretrain_hned.py --steps 300 --out artifacts/hned_synth.npz

Export format matches io/weights.load_hned_params (<name>.kernel HWIO +
<name>.bias), identical to tools/convert_torch_weights.py output.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse

import numpy as np


def gt_edges(seg: np.ndarray) -> np.ndarray:
    """Boundary map of an integer layout (H, W) -> float {0,1} (H, W, 1):
    a pixel is an edge iff any 4-neighbor has a different class id."""
    e = np.zeros(seg.shape, bool)
    e[:-1] |= seg[:-1] != seg[1:]
    e[1:] |= seg[1:] != seg[:-1]
    e[:, :-1] |= seg[:, :-1] != seg[:, 1:]
    e[:, 1:] |= seg[:, 1:] != seg[:, :-1]
    return e.astype(np.float32)[..., None]


def export_hned_npz(params: dict, path: str):
    """Flax HNED param tree -> flat npz (io/weights.load_hned_params)."""
    flat = {}
    for name, leaf in params["params"].items():
        flat[f"{name}.kernel"] = np.asarray(leaf["kernel"], np.float32)
        flat[f"{name}.bias"] = np.asarray(leaf["bias"], np.float32)
    _os.makedirs(_os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **flat)


def balanced_bce(logits_sigmoid, target):
    """HED class-balanced BCE: edges are rare, so the positive class is
    weighted by the negative fraction and vice versa (Xie & Tu 2015 eq. 2).
    Inputs are post-sigmoid maps (the HNED module applies sigmoid)."""
    import jax.numpy as jnp
    p = jnp.clip(logits_sigmoid, 1e-6, 1 - 1e-6)
    y = target
    n_pos = jnp.sum(y) + 1.0
    n_neg = jnp.sum(1.0 - y) + 1.0
    beta = n_neg / (n_pos + n_neg)
    return -jnp.mean(beta * y * jnp.log(p)
                     + (1.0 - beta) * (1.0 - y) * jnp.log(1.0 - p))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--out", type=str, default="artifacts/hned_synth.npz")
    ap.add_argument("--eval_only", type=str, default=None,
                    help="skip training; report edge F1 of this artifact")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from video_layout_generation_tpu.data.synthetic import SyntheticTriplets
    from video_layout_generation_tpu.models import HNED

    hw = (args.size, args.size)
    ds = SyntheticTriplets(4096, hw, 20, seed=7, cache=False)
    model = HNED()  # fp32: the artifact is the deliverable, not step speed

    def batch_at(step: int):
        idx = [(step * args.bs + k) % len(ds) for k in range(args.bs)]
        imgs, edges = [], []
        for i in idx:
            s = ds[i]
            img = s["img1"]
            if img.dtype == np.uint8:
                img = img.astype(np.float32) / 255.0
            seg = np.asarray(s["seg1"][..., 0])
            imgs.append(img)
            edges.append(gt_edges(seg))
        return np.stack(imgs), np.stack(edges)

    def loss_fn(params, img, edge):
        outs = model.apply(params, img)  # 6-tuple of sigmoid maps
        return sum(balanced_bce(o, edge) for o in outs) / len(outs)

    if args.eval_only:
        from video_layout_generation_tpu.io.weights import load_hned_params
        params = load_hned_params(args.eval_only)
    else:
        params = jax.jit(model.init)(jax.random.key(0),
                                     jnp.zeros((1,) + hw + (3,)))
        tx = optax.adam(args.lr)
        opt = tx.init(params)

        @jax.jit
        def step_fn(params, opt, img, edge):
            loss, grads = jax.value_and_grad(loss_fn)(params, img, edge)
            upd, opt = tx.update(grads, opt, params)
            return optax.apply_updates(params, upd), opt, loss

        for step in range(args.steps):
            img, edge = batch_at(step)
            params, opt, loss = step_fn(params, opt, jnp.asarray(img),
                                        jnp.asarray(edge))
            if step % 25 == 0 or step == args.steps - 1:
                print(f"step {step}: loss {float(loss):.4f}", flush=True)
        export_hned_npz(jax.device_get(params), args.out)
        print(f"wrote {args.out}")

    # held-out edge quality: F1 of the fused output at threshold 0.5
    ds_val = SyntheticTriplets(16, hw, 20, seed=4243, cache=False)
    tp = fp = fn = 0.0
    fuse_fn = jax.jit(lambda p, x: model.apply(p, x)[-1])
    for i in range(len(ds_val)):
        s = ds_val[i]
        img = s["img1"]
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        gt = gt_edges(np.asarray(s["seg1"][..., 0]))[..., 0] > 0.5
        pred = np.asarray(fuse_fn(params, jnp.asarray(img)[None]))[0, ..., 0]
        pb = pred > 0.5
        tp += float(np.sum(pb & gt))
        fp += float(np.sum(pb & ~gt))
        fn += float(np.sum(~pb & gt))
    prec = tp / max(tp + fp, 1.0)
    rec = tp / max(tp + fn, 1.0)
    f1 = 2 * prec * rec / max(prec + rec, 1e-9)
    print(f"edge F1 {f1:.4f} (precision {prec:.4f} recall {rec:.4f})")
    return f1


if __name__ == "__main__":
    main()

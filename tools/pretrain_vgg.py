"""Pretrain the VGG19 perceptual trunk and export the weight artifact.

The reference's perceptual loss uses *pretrained* torchvision VGG19 features
(src/loss.py:29-49). Real ImageNet weights cannot be fetched here (zero
egress; see DEVIATIONS.md), so this produces the capability-equivalent
artifact: the exact `VGG19Features` trunk (through relu4_4) is trained with
a dense segmentation probe — a 1x1 conv head on the 1/8-resolution relu4_4
features classifying the layout class of each 8x8 cell. Features that
linearly decode layout semantics are by construction discriminative for the
domain the perceptual loss compares, which is the property pretrained
features supply. A converted torchvision checkpoint remains a drop-in
replacement via tools/convert_torch_weights.py.

  python tools/pretrain_vgg.py --steps 400 --out artifacts/vgg_synth.npz

Export format matches losses/vgg.load_vgg_params (conv{b}_{j}.kernel HWIO +
conv{b}_{j}.bias), identical to the converter's output.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse

import numpy as np


def export_vgg_npz(params: dict, path: str):
    """Flax VGG19Features param tree -> flat npz (losses/vgg.load_vgg_params).
    The probe head is NOT exported — the artifact is the frozen trunk."""
    flat = {}
    for name, leaf in params["params"].items():
        if not name.startswith("conv"):
            continue
        flat[f"{name}.kernel"] = np.asarray(leaf["kernel"], np.float32)
        flat[f"{name}.bias"] = np.asarray(leaf["bias"], np.float32)
    _os.makedirs(_os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **flat)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--n_classes", type=int, default=20)
    ap.add_argument("--out", type=str, default="artifacts/vgg_synth.npz")
    ap.add_argument("--eval_only", type=str, default=None,
                    help="skip training; report probe accuracy of artifact "
                         "(head retrained, trunk frozen, quick)")
    args = ap.parse_args(argv)

    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import optax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from video_layout_generation_tpu.data.synthetic import SyntheticTriplets
    from video_layout_generation_tpu.losses.vgg import VGG19Features

    hw = (args.size, args.size)
    ds = SyntheticTriplets(4096, hw, args.n_classes, seed=11, cache=False)

    class Probe(nn.Module):
        """VGG trunk + 1x1 seg head at 1/8 res (relu4_4 spatial grid)."""
        @nn.compact
        def __call__(self, x):
            feats = VGG19Features(name="trunk")(x)
            return nn.Conv(args.n_classes, (1, 1), name="head")(feats)

    model = Probe()

    def batch_at(step: int, source=ds):
        idx = [(step * args.bs + k) % len(source) for k in range(args.bs)]
        imgs, segs = [], []
        for i in idx:
            s = source[i]
            img = s["img1"]
            if img.dtype == np.uint8:
                img = img.astype(np.float32) / 255.0
            # majority-pool the layout to the 1/8-res probe grid
            seg = np.asarray(s["seg1"][..., 0]).astype(np.int32)
            h8, w8 = args.size // 8, args.size // 8
            seg8 = seg.reshape(h8, 8, w8, 8)[:, 4, :, 4]  # center sample
            imgs.append(img)
            segs.append(seg8)
        return np.stack(imgs), np.stack(segs)

    def loss_fn(params, img, seg8):
        logits = model.apply(params, img)
        onehot = jax.nn.one_hot(seg8, args.n_classes)
        ce = optax.softmax_cross_entropy(logits, onehot).mean()
        acc = jnp.mean(jnp.argmax(logits, -1) == seg8)
        return ce, acc

    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1,) + hw + (3,)))
    if args.eval_only:
        from video_layout_generation_tpu.losses.vgg import load_vgg_params
        trunk = load_vgg_params(args.eval_only)["params"]
        params = jax.tree_util.tree_map(lambda x: x, params)  # copy
        params["params"]["trunk"] = trunk
        # retrain only the head so the probe measures the frozen trunk
        label = jax.tree_util.tree_map_with_path(
            lambda p, _: "head" if any(
                getattr(k, "key", None) == "head" for k in p) else "trunk",
            params)
        tx = optax.multi_transform(
            {"head": optax.adam(1e-3), "trunk": optax.set_to_zero()}, label)
    else:
        tx = optax.adam(args.lr)
    opt = tx.init(params)

    @jax.jit
    def step_fn(params, opt, img, seg8):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, img, seg8)
        upd, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, upd), opt, loss, acc

    steps = args.steps if not args.eval_only else max(args.steps // 2, 100)
    for step in range(steps):
        img, seg8 = batch_at(step)
        params, opt, loss, acc = step_fn(params, opt, jnp.asarray(img),
                                         jnp.asarray(seg8))
        if step % 25 == 0 or step == steps - 1:
            print(f"step {step}: ce {float(loss):.4f} "
                  f"probe-acc {float(acc):.4f}", flush=True)

    if not args.eval_only:
        trunk = jax.device_get(params)["params"]["trunk"]
        export_vgg_npz({"params": trunk}, args.out)
        print(f"wrote {args.out}")

    # held-out probe accuracy (the trunk-quality metric)
    ds_val = SyntheticTriplets(32, hw, args.n_classes, seed=4243, cache=False)
    acc_fn = jax.jit(lambda p, x, s: loss_fn(p, x, s)[1])
    accs = []
    for step in range(len(ds_val) // args.bs):
        img, seg8 = batch_at(step, ds_val)
        accs.append(float(acc_fn(params, jnp.asarray(img),
                                 jnp.asarray(seg8))))
    print(f"held-out probe acc {np.mean(accs):.4f} "
          f"(chance {1.0 / args.n_classes:.4f})")
    return float(np.mean(accs))


if __name__ == "__main__":
    main()

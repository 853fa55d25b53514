"""Multi-step (backprop-through-rollout) training.

Beyond-reference capability (the reference trains strictly one step ahead,
src/trainer.py:175-258, and its rollout quality decays with horizon): train
the predictor on K consecutive autoregressive steps, feeding its own
predictions back exactly like the inference rollout (train/rollout.py), and
average the reference 3-term loss over the K predicted frames. With K=1
the objective (and the compiled program's math) is identical to
``make_train_step`` — tested in tests/test_multistep.py.

TPU design: the K-step unroll is ONE ``lax.scan`` inside the jitted step —
gradients flow through the scan (backprop-through-time), XLA schedules one
rollout + one transposed rollout. Feedback semantics match the edge-mode
rollout: the predicted frame is fed back differentiably; the layout
feedback is ``stop_gradient(argmax)`` (argmax has no useful gradient) and
recomputed HNED edges are ``stop_gradient``-ed (frozen net; avoids K extra
VGG16-class backward passes for a gradient path the layout feedback already
breaks). ``remat_steps=True`` wraps each scan step in ``jax.checkpoint`` so
the live activation set stays one-step deep at 2x forward FLOPs.

Data contract: the stacked window batch {"imgs": (N,T,H,W,3), "segs":
(N,T,H,W)} with T = K+2 (2 seed frames + K targets), produced by
``SyntheticTriplets(n_frames=K+2)`` / ``CityscapesSequences`` and shipped
as ONE packed uint8 array by ``pack_triplet_batch`` ("packedseq").
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ..losses.ce import cross_entropy_loss
from ..losses.pixel import l1_loss
from .assemble import (assemble_model_input, denormalize_image,
                       normalize_image, normalize_model_output)
from .state import TrainState


def decode_window_batch(batch: Dict[str, jnp.ndarray]):
    """Device-side decode of the stacked window batch -> (imgs f32 [0,1]
    (N,T,H,W,3), segs i32 (N,T,H,W)). Accepts the packed uint8 upload
    ("packedseq"), uint8 pairs, or float pairs."""
    if "packedseq" in batch:
        p = batch["packedseq"]
        imgs, segs = p[..., 0:3], p[..., 3]
    else:
        imgs, segs = batch["imgs"], batch["segs"]
    if imgs.dtype == jnp.uint8:
        imgs = imgs.astype(jnp.float32) * (1.0 / 255.0)
    return imgs, segs.astype(jnp.int32)


def window_to_triplet_batch(batch: Dict[str, jnp.ndarray]
                            ) -> Dict[str, jnp.ndarray]:
    """First-triplet view of a window batch (float triplet contract) — lets
    triplet consumers (eval step, TB image grids) read multi-step batches."""
    imgs, segs = decode_window_batch(batch)
    return {"img1": imgs[:, 0], "img2": imgs[:, 1], "img3": imgs[:, 2],
            "seg1": segs[:, 0].astype(jnp.float32)[..., None],
            "seg2": segs[:, 1].astype(jnp.float32)[..., None],
            "seg3": segs[:, 2]}


def is_window_batch(batch: Dict[str, jnp.ndarray]) -> bool:
    return "packedseq" in batch or "imgs" in batch


def make_multistep_loss_fn(model_apply: Callable,
                           hned_apply: Optional[Callable], combined_loss,
                           k: int, w_l1: float = 40.0, w_style: float = 20.0,
                           w_seg: float = 10.0, remat_steps: bool = True,
                           discount: float = 1.0,
                           feedback_noise: float = 0.0,
                           layout_noise: float = 0.0,
                           image_weight: float = 1.0,
                           image_discount: float = 1.0):
    """Build ``loss(params, hned_params, imgs, segs, coin, noise_key)``
    -> (loss, metrics) over K autoregressive steps. imgs: (N,K+2,H,W,3)
    in [0,1]; segs: (N,K+2,H,W) int; coin: bool whole-batch flip.

    ``discount`` < 1 UP-weights late steps: step i carries weight
    discount**(k-1-i), normalized to mean 1 so the loss scale (and
    therefore the Adam-calibrated lr) is unchanged — discount=1 is the
    plain mean and is bit-identical to the original objective.

    ``feedback_noise`` > 0 adds N(0, sigma) to the fed-back predicted frame
    (in normalized space) during training — the model learns to tolerate
    its own imperfect feedback, a train/rollout distribution-gap remedy.

    ``layout_noise`` > 0 is the layout-channel counterpart: each fed-back
    layout pixel is replaced with a uniform random class with that
    probability — the lever for LAYOUT-channel feedback drift named by
    tools/fidelity_decompose.py (class ids can't take Gaussian noise, so
    the perturbation is categorical). 0 keeps the feedback exact.

    ``image_weight`` != 1 scales the IMAGE terms (l1 + style) relative to
    the seg term — the decomposition (BENCH_NOTES round 4) names
    image-feedback drift as the binding rollout constraint, and these are
    the terms that shape the frames the model feeds itself. The total is
    renormalized by (w_l1+w_style+w_seg)/(m*(w_l1+w_style)+w_seg) so the
    overall loss scale (and the Adam-calibrated lr of the warm-start
    recipe) is approximately preserved.

    ``image_discount`` < 1 up-weights EARLY steps' image terms (step i
    image weight = image_discount**i, mean-normalized): an early step's
    predicted frame is re-fed K-1-i more times, so its fidelity compounds.
    Composes multiplicatively with ``discount`` (which weights all three
    terms). Defaults (1.0, 1.0) keep the objective bit-identical to the
    pre-lever program.

    Flip order matches the reference (src/trainer.py:190-206): seed edges
    are extracted from the UNFLIPPED frames, then inputs, targets, and edge
    maps all flip together."""
    if k < 1:
        raise ValueError(f"multistep k must be >= 1, got {k}")
    use_edges = hned_apply is not None
    # static per-step weights, mean 1 (discount=1 -> all ones -> plain mean)
    step_w = jnp.asarray([discount ** (k - 1 - i) for i in range(k)],
                         jnp.float32)
    step_w = step_w / jnp.mean(step_w)

    def edge(hned_params, frame_n):
        e = hned_apply(hned_params, denormalize_image(frame_n))[-1]
        return jax.lax.stop_gradient(e)

    def loss_fn(params, hned_params, imgs, segs, coin, noise_key=None):
        if imgs.shape[1] != k + 2:
            raise ValueError(f"multistep k={k} needs {k + 2}-frame windows, "
                             f"got {imgs.shape[1]}")
        f_old = normalize_image(imgs[:, 0])
        f_new = normalize_image(imgs[:, 1])
        s_old = segs[:, 0].astype(jnp.float32)[..., None]
        s_new = segs[:, 1].astype(jnp.float32)[..., None]
        # (K, N, ...) targets for the scan
        tgt_f = jnp.moveaxis(normalize_image(imgs[:, 2:]), 1, 0)
        tgt_s = jnp.moveaxis(segs[:, 2:], 1, 0)
        seeds = (f_old, f_new, s_old, s_new)
        if use_edges:
            # seed edges from the raw [0,1] frames — bit-identical to
            # prepare_inputs (steps.py); the in-scan recompute goes through
            # denormalize_image like the inference rollout
            seeds = seeds + tuple(
                jax.lax.stop_gradient(hned_apply(hned_params, imgs[:, i])[-1])
                for i in (0, 1))

        def flip_all(t):
            seeds, tgt_f, tgt_s = t
            return (tuple(jnp.flip(s, axis=-2) for s in seeds),
                    jnp.flip(tgt_f, axis=-2), jnp.flip(tgt_s, axis=-1))

        seeds, tgt_f, tgt_s = jax.lax.cond(coin, flip_all, lambda t: t,
                                           (seeds, tgt_f, tgt_s))

        any_noise = feedback_noise > 0.0 or layout_noise > 0.0

        def step(carry, xs):
            if any_noise:
                tf, ts, nkey = xs
            else:
                tf, ts = xs
            if use_edges:
                f_o, f_n, s_o, s_n, e_o, e_n = carry
                x = assemble_model_input(s_o, f_o, f_n, s_n, e_o, e_n)
            else:
                f_o, f_n, s_o, s_n = carry
                x = assemble_model_input(s_o, f_o, f_n, s_n)
            seg_logits, img = model_apply(params, x)
            img_n = normalize_model_output(img)
            step_l1 = l1_loss(img_n, tf) * w_l1
            step_style = combined_loss(img_n, tf) * w_style
            step_seg = cross_entropy_loss(seg_logits, ts) * w_seg
            s_next = jax.lax.stop_gradient(
                jnp.argmax(seg_logits, axis=-1))[..., None].astype(
                    jnp.float32)
            if layout_noise > 0.0:
                k_mask = jax.random.fold_in(nkey, 1)
                k_cls = jax.random.fold_in(nkey, 2)
                corrupt = jax.random.bernoulli(k_mask, layout_noise,
                                               s_next.shape)
                rand_cls = jax.random.randint(
                    k_cls, s_next.shape, 0, seg_logits.shape[-1]
                ).astype(jnp.float32)
                s_next = jnp.where(corrupt, rand_cls, s_next)
            img_fb = img_n
            if feedback_noise > 0.0:
                # nkey used directly: keeps the stream bit-identical to the
                # pre-layout_noise program (r3 campaign legs)
                img_fb = img_n + feedback_noise * jax.random.normal(
                    nkey, img_n.shape, img_n.dtype)
            if use_edges:
                carry = (f_n, img_fb, s_n, s_next, e_n,
                         edge(hned_params, img_fb))
            else:
                carry = (f_n, img_fb, s_n, s_next)
            return carry, jnp.stack([step_l1, step_style, step_seg])

        xs = (tgt_f, tgt_s)
        if any_noise:
            xs = xs + (jax.random.split(noise_key, k),)
        body = jax.checkpoint(step) if (remat_steps and k > 1) else step
        _, per_step = jax.lax.scan(body, seeds, xs, length=k)
        # per_step: (K, 3); discount=1 -> plain mean keeps K=1 == the
        # reference loss; discount<1 up-weights late (harder) steps
        if image_weight == 1.0 and image_discount == 1.0:
            terms = jnp.mean(step_w[:, None] * per_step, axis=0)
            total = jnp.sum(terms)
        else:
            img_w = jnp.asarray([image_discount ** i for i in range(k)],
                                jnp.float32)
            img_w = step_w * (img_w / jnp.mean(img_w)) * image_weight
            w_mat = jnp.stack([img_w, img_w, step_w], axis=1)
            terms = jnp.mean(w_mat * per_step, axis=0)
            renorm = (w_l1 + w_style + w_seg) / (
                image_weight * (w_l1 + w_style) + w_seg)
            terms = renorm * terms
            total = jnp.sum(terms)
        metrics = {"loss": total, "loss_l1": terms[0],
                   "loss_style": terms[1], "loss_seg": terms[2],
                   "loss_per_step": jnp.sum(per_step, axis=1)}
        return total, metrics

    return loss_fn


def make_multistep_train_step(model_apply: Callable,
                              hned_apply: Optional[Callable], combined_loss,
                              k: int, w_l1: float = 40.0,
                              w_style: float = 20.0, w_seg: float = 10.0,
                              flip_mode: str = "batch",
                              remat_steps: bool = True, donate: bool = True,
                              jit: bool = True, discount: float = 1.0,
                              feedback_noise: float = 0.0,
                              layout_noise: float = 0.0,
                              image_weight: float = 1.0,
                              image_discount: float = 1.0):
    """Returns jitted ``train_step(state, hned_params, batch, rng)`` over
    the window contract; the reference's whole-batch flip coin
    (src/trainer.py:200) applies to the full window."""
    loss_fn = make_multistep_loss_fn(model_apply, hned_apply, combined_loss,
                                     k, w_l1, w_style, w_seg, remat_steps,
                                     discount, feedback_noise, layout_noise,
                                     image_weight, image_discount)

    def train_step(state: TrainState, hned_params, batch, rng):
        imgs, segs = decode_window_batch(batch)
        coin = (jax.random.bernoulli(rng) if flip_mode == "batch"
                else jnp.asarray(False))
        noise_key = (jax.random.fold_in(rng, 7)
                     if feedback_noise > 0.0 or layout_noise > 0.0
                     else None)
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, hned_params, imgs, segs, coin, noise_key)
        return state.apply_gradients(grads), metrics

    if not jit:
        return train_step
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())

"""Fused jitted train/eval steps.

One compiled program per step covers the reference's whole hot loop
(src/trainer.py:175-258): frozen HNED edge extraction, normalization, input
assembly, random horizontal flip, model forward, the 3-term loss
(w_l1*L1 + w_style*(VGG+SSIM+Grad) + w_seg*CE), gradients, and the optimizer
update. Under a sharded batch, the mean-reductions in the loss make XLA
insert the cross-device gradient reduction automatically (the DP allreduce
the reference got from DDP, SURVEY.md §2b).

The flip is one coin per step over the whole batch — matching the
reference's ``random.random() < 0.5`` (src/trainer.py:200); per-example
flip is available via ``flip_mode='per_example'`` (documented deviation,
better augmentation).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ..losses.ce import cross_entropy_loss
from ..losses.pixel import l1_loss
from .assemble import (assemble_model_input, normalize_image,
                       normalize_model_output)
from .state import TrainState


def _flip_w(x):
    """Horizontal flip: W is axis -2 for NHWC tensors, axis -1 for (N,H,W)
    integer maps (the reference flips seg3 on its last axis,
    src/trainer.py:206)."""
    if x.ndim == 4:
        return jnp.flip(x, axis=-2)
    if x.ndim == 3:
        return jnp.flip(x, axis=-1)
    return x


def _maybe_flip(coin, *tensors):
    return tuple(jax.lax.cond(coin, lambda ts: tuple(map(_flip_w, ts)),
                              lambda ts: ts, tensors))


def decode_batch(batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Device-side decode of compact-transfer batches.

    The pipeline may ship frames/layouts as uint8 (4x less H2D traffic —
    decisive on tunneled devices, and exact for 8-bit PNG sources like
    Cityscapes): frames become float32 in [0,1], layout ids become float32
    model channels / int32 targets. float32 batches pass through unchanged
    (dtype checks resolve at trace time)."""
    if "packed6" in batch:
        # single fused uint8 upload (data/pipeline.py:pack_triplet_batch);
        # the slices fuse into the consumers for free
        p = batch["packed6"]
        batch = {"img1": p[..., 0:3], "img2": p[..., 3:6],
                 "img3": p[..., 6:9], "seg1": p[..., 9:10],
                 "seg2": p[..., 10:11], "seg3": p[..., 11]}
    out = dict(batch)
    for k in ("img1", "img2", "img3"):
        if k in out and out[k].dtype == jnp.uint8:
            out[k] = out[k].astype(jnp.float32) * (1.0 / 255.0)
    for k in ("seg1", "seg2"):
        if k in out and out[k].dtype != jnp.float32:
            out[k] = out[k].astype(jnp.float32)
    if "seg3" in out and out["seg3"].dtype != jnp.int32:
        out["seg3"] = out["seg3"].astype(jnp.int32)
    return out


def prepare_inputs(hned_apply: Optional[Callable], hned_params,
                   batch: Dict[str, jnp.ndarray]):
    """Edges + normalization + channel assembly (no flip)."""
    f1, f2, f3 = batch["img1"], batch["img2"], batch["img3"]
    s1, s2 = batch["seg1"], batch["seg2"]
    if hned_apply is not None:
        e1 = jax.lax.stop_gradient(hned_apply(hned_params, f1)[-1])
        e2 = jax.lax.stop_gradient(hned_apply(hned_params, f2)[-1])
    else:
        e1 = e2 = None
    f1n, f2n, f3n = (normalize_image(f) for f in (f1, f2, f3))
    x = assemble_model_input(s1, f1n, f2n, s2, e1, e2)
    return x, f3n


def make_loss_fn(model_apply: Callable, combined_loss,
                 w_l1: float = 40.0, w_style: float = 20.0,
                 w_seg: float = 10.0):
    """Build loss(params, x, f3n, s3) -> (loss, metrics)."""

    def loss_fn(params, x, f3n, s3):
        seg_logits, img = model_apply(params, x)
        img_n = normalize_model_output(img)
        loss_l1 = l1_loss(img_n, f3n) * w_l1
        loss_style = combined_loss(img_n, f3n) * w_style
        loss_seg = cross_entropy_loss(seg_logits, s3) * w_seg
        total = loss_l1 + loss_style + loss_seg
        metrics = {"loss": total, "loss_l1": loss_l1,
                   "loss_style": loss_style, "loss_seg": loss_seg}
        return total, (metrics, seg_logits, img_n)

    return loss_fn


def make_train_step(model_apply: Callable, hned_apply: Optional[Callable],
                    combined_loss, w_l1: float = 40.0, w_style: float = 20.0,
                    w_seg: float = 10.0, flip_mode: str = "batch",
                    donate: bool = True, jit: bool = True):
    """Returns jitted ``train_step(state, hned_params, batch, rng)``
    (``jit=False`` returns the raw traceable body — the epoch-scan
    executor composes it inside its own compiled program)."""
    loss_fn = make_loss_fn(model_apply, combined_loss, w_l1, w_style, w_seg)

    def train_step(state: TrainState, hned_params, batch, rng):
        batch = decode_batch(batch)
        x, f3n = prepare_inputs(hned_apply, hned_params, batch)
        s3 = batch["seg3"]
        if flip_mode == "batch":
            coin = jax.random.bernoulli(rng)
            x, f3n, s3 = _maybe_flip(coin, x, f3n, s3)
        elif flip_mode == "per_example":
            coins = jax.random.bernoulli(rng, shape=(x.shape[0],))
            sel = lambda t: jnp.where(
                coins.reshape((-1,) + (1,) * (t.ndim - 1)), _flip_w(t), t)
            x, f3n, s3 = sel(x), sel(f3n), sel(s3)
        (_, (metrics, _, _)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, x, f3n, s3)
        new_state = state.apply_gradients(grads)
        return new_state, metrics

    if not jit:
        return train_step
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(model_apply: Callable, hned_apply: Optional[Callable],
                   combined_loss, w_l1: float = 40.0, w_style: float = 20.0,
                   w_seg: float = 10.0, n_classes: Optional[int] = None):
    """Returns jitted ``eval_step(params, hned_params, batch)`` producing
    (metrics, seg_pred_ids, img_pred_norm).

    With ``n_classes`` set, ``metrics['cm']`` carries the (C, C) confusion
    matrix reduced over the GLOBAL batch inside the compiled program — under
    a multi-host mesh this replaces the reference's explicit validation
    all_reduce (src/trainer.py:336-340): the output is replicated, so every
    process accumulates identical totals.
    """
    loss_fn = make_loss_fn(model_apply, combined_loss, w_l1, w_style, w_seg)

    def eval_step(params, hned_params, batch):
        batch = decode_batch(batch)
        x, f3n = prepare_inputs(hned_apply, hned_params, batch)
        _, (metrics, seg_logits, img_n) = loss_fn(params, x, f3n,
                                                  batch["seg3"])
        seg_ids = jnp.argmax(seg_logits, axis=-1)
        if n_classes is not None:
            from ..evaluation.metrics import confusion_matrix
            metrics = dict(metrics,
                           cm=confusion_matrix(seg_ids, batch["seg3"],
                                               n_classes))
        return metrics, seg_ids, img_n

    return jax.jit(eval_step)

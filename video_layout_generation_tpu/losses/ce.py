"""Cross-entropy losses over segmentation logits (NHWC, fp32 islands).

- ``cross_entropy_loss``: mean CE over all pixels (torch nn.CrossEntropyLoss
  parity; reference src/trainer.py:124,250).
- ``weighted_masked_ce``: per-class-weighted CE summed over pixels and
  normalized by the *unmasked* element count — the legacy completion loss
  (reference src/models/simple.py:56-59). Note torch's weighted 'sum'
  reduction multiplies each pixel's CE by its target-class weight.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray
                       ) -> jnp.ndarray:
    """logits (N,H,W,C) fp-any; labels (N,H,W) int. Mean over all pixels."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(
        logp, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
    return -jnp.mean(picked)


def class_weighted_ce(logits: jnp.ndarray, labels: jnp.ndarray,
                      class_weights: jnp.ndarray) -> jnp.ndarray:
    """Class-weighted mean CE (torch nn.CrossEntropyLoss(weight=w) parity:
    sum(w_y * ce) / sum(w_y)). Used by the VAE-family recon objectives,
    where the unweighted mean leaves ~no gradient for minority classes
    (synthetic layouts are ~88% background; BENCH_NOTES 'Config 1')."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    labels = labels.astype(jnp.int32)
    picked = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    w = jnp.asarray(class_weights, jnp.float32)[labels]
    return jnp.sum(-picked * w) / jnp.maximum(jnp.sum(w), 1e-6)


def weighted_masked_ce(logits: jnp.ndarray, labels: jnp.ndarray,
                       mask: jnp.ndarray,
                       class_weights: Sequence[float]) -> jnp.ndarray:
    """Sum of class-weighted CE over all pixels / count of unmasked pixels.

    mask==1 marks the cropped/masked region (reference semantics: loss
    normalized by ``(1-mask).nonzero().size(0)``).
    """
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    labels = labels.astype(jnp.int32)
    picked = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    w = jnp.asarray(class_weights, jnp.float32)[labels]
    total = jnp.sum(-picked * w)
    denom = jnp.maximum(jnp.sum(1.0 - mask.astype(jnp.float32)), 1.0)
    return total / denom

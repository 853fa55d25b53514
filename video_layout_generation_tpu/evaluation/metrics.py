"""Layout quality metrics: per-class IoU and pixel accuracy.

The reference computes no quality metric beyond validation loss
(SURVEY.md §5 'Metrics'); the north star (BASELINE.json) requires per-class
layout IoU, so this is a new capability. The confusion matrix is computed
on-device as a one-hot matmul (MXU-friendly, jit-safe) and accumulated over
batches; IoU/accuracy derive from it on host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnums=(2,))
def confusion_matrix(pred: jnp.ndarray, target: jnp.ndarray,
                     n_classes: int) -> jnp.ndarray:
    """pred/target: (..., H, W) integer ids. Returns (C, C) counts
    [target, pred]."""
    p = jax.nn.one_hot(pred.reshape(-1), n_classes, dtype=jnp.float32)
    t = jax.nn.one_hot(target.reshape(-1), n_classes, dtype=jnp.float32)
    return jnp.einsum("nc,nk->ck", t, p,
                      preferred_element_type=jnp.float32)


def iou_from_confusion(cm: np.ndarray, ignore_empty: bool = True):
    """Returns (per_class_iou (C,), mean_iou). Classes absent from both
    pred and target get NaN and are excluded from the mean."""
    cm = np.asarray(cm, np.float64)
    tp = np.diag(cm)
    denom = cm.sum(0) + cm.sum(1) - tp
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = np.where(denom > 0, tp / denom, np.nan)
    mean = np.nanmean(iou) if np.any(denom > 0) else 0.0
    return iou, float(mean)


def pixel_accuracy(cm: np.ndarray) -> float:
    cm = np.asarray(cm, np.float64)
    total = cm.sum()
    return float(np.diag(cm).sum() / total) if total else 0.0


def summarize_confusion(cm_total, n_classes: int):
    """(per_class_iou, miou, pixel_acc) from an accumulated confusion
    matrix; handles the empty-loader case (cm_total is None)."""
    if cm_total is None:
        return np.full(n_classes, np.nan), 0.0, 0.0
    cm = np.asarray(cm_total)
    iou, miou = iou_from_confusion(cm)
    return iou, miou, pixel_accuracy(cm)

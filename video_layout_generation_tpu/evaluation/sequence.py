"""Rollout fidelity evaluation.

The north star (BASELINE.json) asks for layout-fidelity evaluation across
*predicted frames*: per-step per-class IoU / pixel accuracy of the
autoregressive rollout against ground-truth future layouts. The reference
had no such metric (SURVEY.md §5); this is the rebuild's quantitative
counterpart to its qualitative .npy dumps.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
import numpy as np

from .metrics import confusion_matrix, iou_from_confusion, pixel_accuracy


def rollout_fidelity(pred_segs, gt_segs, n_classes: int = 20
                     ) -> Dict[str, np.ndarray]:
    """pred_segs: (N, T, H, W[, 1]) predicted layout ids (float ok);
    gt_segs: (N, T, H, W) ground-truth ids.

    Returns per-step mIoU / pixel accuracy arrays of length T plus the
    sequence means.
    """
    pred = jnp.asarray(pred_segs)
    if pred.ndim == 5:
        pred = pred[..., 0]
    pred = pred.astype(jnp.int32)
    gt = jnp.asarray(gt_segs).astype(jnp.int32)
    # predicted horizon and available ground truth may disagree (e.g. the
    # trainer's rollout_frames vs the requested n_frames); score the overlap
    t = min(pred.shape[1], gt.shape[1])
    mious, accs = [], []
    for k in range(t):
        cm = np.asarray(confusion_matrix(pred[:, k], gt[:, k], n_classes))
        _, miou = iou_from_confusion(cm)
        mious.append(miou)
        accs.append(pixel_accuracy(cm))
    return {
        "per_step_miou": np.asarray(mious),
        "per_step_pixel_acc": np.asarray(accs),
        "mean_miou": float(np.mean(mious)),
        "mean_pixel_acc": float(np.mean(accs)),
    }


def evaluate_trainer_rollout(trainer, dataset, indices: Sequence[int],
                             n_frames: int) -> Dict[str, np.ndarray]:
    """Run the trainer's rollout from each sample's first two frames and
    score against the dataset's ground-truth future (datasets must expose
    ``sequence(index, n)`` — the synthetic dataset does)."""
    from ..train.assemble import normalize_image

    imgs1, imgs2, segs1, segs2, gts = [], [], [], [], []
    for i in indices:
        imgs, segs = dataset.sequence(int(i), n_frames + 2)
        if segs.shape[0] < n_frames + 2:
            raise ValueError(
                f"dataset.sequence returned {segs.shape[0]} frames; "
                f"need {n_frames + 2} (2 seeds + {n_frames} futures)")
        imgs1.append(imgs[0])
        imgs2.append(imgs[1])
        segs1.append(segs[0])
        segs2.append(segs[1])
        gts.append(segs[2:])
    img1 = normalize_image(jnp.asarray(np.stack(imgs1)))
    img2 = normalize_image(jnp.asarray(np.stack(imgs2)))
    seg1 = jnp.asarray(np.stack(segs1), jnp.float32)[..., None]
    seg2 = jnp.asarray(np.stack(segs2), jnp.float32)[..., None]
    _, pred_segs = trainer.generate_sequence(img1, img2, seg1, seg2,
                                             save=False)
    return rollout_fidelity(pred_segs, np.stack(gts),
                            trainer.cfg.n_classes)


def evaluate_layout_rollout(trainer, dataset, indices: Sequence[int],
                            n_frames: int) -> Dict[str, np.ndarray]:
    """Rollout fidelity for the layout-only families: continue each
    family's autoregressive generator from a sample's first two GT layouts
    and score per-step mIoU / pixel accuracy against the GT futures
    (LayoutTrainer counterpart of ``evaluate_trainer_rollout``; cvae
    samples its learned prior per step, convlstm feeds argmax back)."""
    import jax

    segs1, segs2, gts = [], [], []
    for i in indices:
        _, segs = dataset.sequence(int(i), n_frames + 2)
        if segs.shape[0] < n_frames + 2:
            raise ValueError(
                f"dataset.sequence returned {segs.shape[0]} frames; "
                f"need {n_frames + 2} (2 seeds + {n_frames} futures)")
        segs1.append(segs[0])
        segs2.append(segs[1])
        gts.append(segs[2:])
    s1 = jnp.asarray(np.stack(segs1), jnp.int32)
    s2 = jnp.asarray(np.stack(segs2), jnp.int32)
    n_cls = trainer.cfg.n_classes
    if trainer.family == "cvae":
        from ..models.vae import make_cvae_rollout
        ro = make_cvae_rollout(trainer.model, n_frames, n_cls)
        pred = ro(trainer.state.params, s1, s2,
                  jax.random.key(trainer.cfg.seed + 2))
    elif trainer.family == "convlstm":
        from ..models.convlstm import ConvLSTMLayoutPredictor
        ctx = jax.nn.one_hot(jnp.stack([s1, s2], axis=1), n_cls)
        pred = trainer.model.apply(trainer.state.params, ctx, n_frames,
                                   method=ConvLSTMLayoutPredictor.rollout)
    else:
        raise ValueError(
            f"rollout fidelity needs an autoregressive family "
            f"(cvae/convlstm), got {trainer.family!r}")
    return rollout_fidelity(pred, np.stack(gts), n_cls)

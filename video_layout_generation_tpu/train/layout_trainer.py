"""Trainer for the layout-only model families (VAE / CVAE / ConvLSTM).

Covers BASELINE.json configs 1-3 end to end: consumes the same triplet
datasets as the main Trainer but uses only the segmentation streams,
trains with the family's objective (KL-annealed where variational), and
validates next-layout prediction with per-class IoU / pixel accuracy.
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.pipeline import HostLoader, ShardedLoader
from ..evaluation.metrics import confusion_matrix, summarize_confusion
from ..io.checkpoint import CheckpointManager, reshape_like
from ..io.logging import get_logger
from ..models.convlstm import ConvLSTMLayoutPredictor
from ..models.vae import LayoutCVAE, LayoutVAE, make_cvae_rollout
from ..parallel.mesh import is_primary, make_mesh
from .state import TrainState, make_optimizer
from .vae_steps import (kl_anneal, make_convlstm_multistep_train_step,
                        make_convlstm_train_step,
                        make_cvae_multistep_train_step,
                        make_cvae_train_step, make_vae_train_step)


class LayoutTrainer:
    """family: 'vae' | 'cvae' | 'convlstm'."""

    def __init__(self, cfg: Config, family: str = "cvae",
                 latent_dim: int = 32, hidden: int = 64,
                 kl_warmup_steps: int = 500, beta_max: float = 1.0,
                 dataset_train=None, dataset_val=None,
                 free_bits: float = 0.0, kl_cycle_steps: int = 0,
                 capacity_max: float = 0.0, capacity_steps: int = 1000,
                 bg_weight: float = 1.0, vae_widths=None,
                 dec_refines: int = 1):
        """Posterior-collapse remedies (vae family only, all default-off;
        losses/vae.py docstring): ``free_bits`` per-dim KL floor,
        ``kl_cycle_steps`` cyclical beta annealing, ``capacity_max``/
        ``capacity_steps`` the Burgess capacity objective, ``bg_weight``
        down-weights class 0 in the recon CE (balanced gradient for the
        ~12% minority-class pixels)."""
        self.cfg = cfg
        self.family = family
        self.kl_warmup = kl_warmup_steps
        self.beta_max = beta_max
        self.kl_cycle_steps = kl_cycle_steps
        self.capacity_max = capacity_max
        self.capacity_steps = capacity_steps
        if cfg.path:
            os.makedirs(cfg.path, exist_ok=True)
        self.logger = get_logger(
            os.path.join(cfg.path, "experiment.log") if cfg.path else None,
            process=jax.process_index())
        self.mesh = make_mesh(shape=cfg.mesh_shape)
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
        n_cls = cfg.n_classes
        h, w = cfg.image_size
        rng = jax.random.key(cfg.seed)

        # K-step exposure training (anti-drift lever set proven on the
        # flagship, VERDICT r4 #5): steps > 0 see the model's own fed-back
        # argmax prediction as context. K=1 keeps the exact single-step
        # programs below.
        self.multistep_k = int(getattr(cfg, "multistep_k", 1))
        if self.multistep_k > 1 and family == "vae":
            raise ValueError("multistep_k > 1 needs an autoregressive "
                             "family (cvae/convlstm); the vae family "
                             "autoencodes single frames")

        if family == "vae":
            self.model = LayoutVAE(
                n_cls, latent_dim,
                widths=tuple(vae_widths) if vae_widths else (32, 64, 128),
                dec_refines=dec_refines, dtype=dtype)
            params = jax.jit(self.model.init)(
                rng, jnp.zeros((1, h, w, n_cls)), jax.random.key(1))
            cw = None
            if bg_weight != 1.0:
                cw = [bg_weight] + [1.0] * (n_cls - 1)
            self._step = make_vae_train_step(
                self.model, n_cls, free_bits=free_bits,
                use_capacity=capacity_max > 0.0, class_weights=cw)
        elif family == "cvae":
            self.model = LayoutCVAE(n_cls, latent_dim, dtype=dtype)
            params = jax.jit(self.model.init)(
                rng, jnp.zeros((1, h, w, 2 * n_cls)),
                jnp.zeros((1, h, w, n_cls)), jax.random.key(1))
            if self.multistep_k > 1:
                self._step = make_cvae_multistep_train_step(
                    self.model, n_cls, k=self.multistep_k,
                    layout_noise=cfg.multistep_layout_noise)
            else:
                self._step = make_cvae_train_step(self.model, n_cls)
            self._rollout = make_cvae_rollout(self.model,
                                              cfg.rollout_frames, n_cls)
        elif family == "convlstm":
            self.model = ConvLSTMLayoutPredictor(n_cls, hidden, dtype=dtype)
            params = jax.jit(self.model.init)(
                rng, jnp.zeros((1, 2, h, w, n_cls)))
            if self.multistep_k > 1:
                self._step = make_convlstm_multistep_train_step(
                    self.model, n_cls, k=self.multistep_k,
                    layout_noise=cfg.multistep_layout_noise)
            else:
                self._step = make_convlstm_train_step(self.model, n_cls)
        else:
            raise ValueError(f"unknown layout family {family!r}")

        tx = make_optimizer(cfg.optimizer, cfg.lr, max(cfg.beta1, 0.9))
        self.state = TrainState.create(params, tx)
        self.global_step = 0
        self.epoch = 0
        ckpt_dir = os.path.join(cfg.path, "checkpoint") if cfg.path else None
        self.ckpt = CheckpointManager(ckpt_dir) if ckpt_dir else None
        if cfg.ckpt:
            # weights-only warm start (fresh optimizer/epoch) — the proven
            # objective-switch recipe when moving to the K-step objective
            # (BENCH_NOTES "Multi-step BPTT finetune"; Trainer's cfg.ckpt)
            from ..io.checkpoint import merge_params
            tree = CheckpointManager.restore_path(cfg.ckpt)
            merged, rep = merge_params(self.state.params, tree["params"])
            if not rep["loaded"]:
                raise ValueError(f"ckpt {cfg.ckpt} shares no parameters "
                                 f"with the live layout_{family} model")
            self.state = self.state.replace(params=merged)
            self.logger.info(
                "[layout/%s] warm start from %s: %d loaded, %d missing, "
                "%d unexpected", family, cfg.ckpt, len(rep["loaded"]),
                len(rep["missing"]), len(rep["unexpected"]))
        if cfg.resume:
            self.load_checkpoint(cfg.resume)

        if dataset_train is None:
            from ..data import get_dataset
            dataset_train, dataset_val = get_dataset(cfg)
        mk = lambda ds, sh: ShardedLoader(
            HostLoader(ds, cfg.batch_size, shuffle=sh, seed=cfg.seed,
                       workers=cfg.workers,
                       process_index=jax.process_index(),
                       process_count=jax.process_count(),
                       transfer_uint8=(cfg.transfer_uint8
                                       and cfg.n_classes <= 255)),
            self.mesh, put_thread=cfg.put_thread)
        self.train_loader = mk(dataset_train, True)
        self.val_loader = mk(dataset_val, False)

        # prediction fn for validation (argmax next layout)
        if family == "vae":
            # autoencode seg3
            self._predict = jax.jit(lambda p, b, k: jnp.argmax(
                self.model.apply(p, jax.nn.one_hot(b["seg3"], n_cls),
                                 k)[0], axis=-1))
        elif family == "cvae":
            def pred(p, b, k):
                ctx = jnp.concatenate(
                    [jax.nn.one_hot(b["seg1"][..., 0].astype(jnp.int32),
                                    n_cls),
                     jax.nn.one_hot(b["seg2"][..., 0].astype(jnp.int32),
                                    n_cls)], axis=-1)
                logits = self.model.apply(p, ctx, k,
                                          method=LayoutCVAE.generate)
                return jnp.argmax(logits, axis=-1)
            self._predict = jax.jit(pred)
        else:
            def pred(p, b, k):
                ctx = jnp.stack(
                    [b["seg1"][..., 0], b["seg2"][..., 0]],
                    axis=1).astype(jnp.int32)
                logits = self.model.apply(p, jax.nn.one_hot(ctx, n_cls))
                return jnp.argmax(logits, axis=-1)
            self._predict = jax.jit(pred)

    # ------------------------------------------------------------------
    def _ctx_target(self, batch):
        ctx = jnp.stack([batch["seg1"][..., 0], batch["seg2"][..., 0]],
                        axis=1).astype(jnp.int32)
        return ctx, batch["seg3"].astype(jnp.int32)

    def train_epoch(self) -> Dict[str, float]:
        from .multistep import decode_window_batch, is_window_batch
        from .steps import decode_batch
        self.train_loader.set_epoch(self.epoch)
        metrics = {}
        for batch in self.train_loader:
            window = is_window_batch(batch)
            if window:
                _, segs = decode_window_batch(batch)
            else:
                if self.multistep_k > 1:
                    raise ValueError(
                        "multistep_k > 1 needs the window batch contract "
                        "(K+2-frame train dataset; data.get_dataset emits "
                        "it automatically)")
                batch = decode_batch(batch)  # unpack packed6/uint8 transfer
            self.global_step += 1
            rng = jax.random.fold_in(jax.random.key(self.cfg.seed),
                                     self.global_step)
            beta = kl_anneal(self.global_step, self.kl_warmup,
                             self.beta_max, self.kl_cycle_steps)
            if window:
                # K-step exposure objective over the seg window
                if self.family == "cvae":
                    self.state, metrics = self._step(self.state, segs, rng,
                                                     beta)
                else:
                    self.state, metrics = self._step(self.state, segs, rng)
            elif self.family == "vae":
                args = (self.state, batch["seg3"].astype(jnp.int32), rng,
                        beta)
                if self.capacity_max > 0.0:
                    from .vae_steps import capacity_schedule
                    args = args + (capacity_schedule(
                        self.global_step, self.capacity_max,
                        self.capacity_steps),)
                self.state, metrics = self._step(*args)
            elif self.family == "cvae":
                ctx, tgt = self._ctx_target(batch)
                self.state, metrics = self._step(self.state, ctx, tgt, rng,
                                                 beta)
            else:
                ctx, tgt = self._ctx_target(batch)
                self.state, metrics = self._step(self.state, ctx, tgt)
        self.epoch += 1
        out = {k: float(v) for k, v in metrics.items()}
        if is_primary():
            self.logger.info("[layout/%s] epoch %d %s" % (
                self.family, self.epoch,
                " ".join(f"{k}={v:.4f}" for k, v in out.items())))
        return out

    def validate(self) -> Dict[str, float]:
        from .steps import decode_batch
        cm_total = None
        for i, batch in enumerate(self.val_loader):
            batch = decode_batch(batch)  # unpack packed6 / uint8 transfer
            pred = self._predict(self.state.params, batch,
                                 jax.random.fold_in(
                                     jax.random.key(self.cfg.seed + 1), i))
            cm = confusion_matrix(pred, batch["seg3"].astype(jnp.int32),
                                  self.cfg.n_classes)
            cm_total = cm if cm_total is None else cm_total + cm
        iou, miou, acc = summarize_confusion(cm_total, self.cfg.n_classes)
        if is_primary():
            self.logger.info("[layout/%s] val mIoU %.4f pixAcc %.4f" % (
                self.family, miou, acc))
        return {"miou": miou, "pixel_acc": acc, "per_class_iou": iou}

    def load_checkpoint(self, resume: str):
        """Full resume (epoch + params + opt state), mirroring
        Trainer.load_checkpoint; accepts "latest" or an explicit path."""
        if resume == "latest" and self.ckpt is not None:
            resume = os.path.join(self.ckpt.directory, "latest")
        tree = CheckpointManager.restore_path(
            resume, arch=f"layout_{self.family}")
        self.epoch = int(tree["epoch"])
        self.global_step = int(tree.get("step", 0))
        self.state = self.state.replace(
            params=tree["params"],
            opt_state=reshape_like(self.state.opt_state,
                                   tree["opt_state"]))
        self.logger.info("[layout/%s] resumed at epoch %d"
                         % (self.family, self.epoch))

    def fit(self):
        metrics = {}
        # self.epoch counts completed epochs (restored on resume)
        for _ in range(self.epoch, self.cfg.epochs):
            self.train_epoch()
            metrics = self.validate()
            if self.ckpt is not None and is_primary():
                self.ckpt.save(self.epoch, self.state.params,
                               self.state.opt_state, self.global_step,
                               f"layout_{self.family}")
        return metrics

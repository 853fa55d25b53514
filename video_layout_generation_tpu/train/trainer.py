"""Training orchestration.

Capability parity with the reference Trainer (src/trainer.py:103-476):
builds the predictor + frozen HNED + losses, data loaders, runs the epoch
loop (train -> validate -> checkpoint), logs scalars/images, dumps .npy
prediction stacks, and drives the autoregressive rollout. Implemented as a
thin host loop around fully-jitted steps; all cross-device behavior lives
inside the compiled programs (SURVEY.md §2b).

Differences from the reference (documented intent, not its defects §2c):
- one checkpoint schema (save and load agree),
- per-class IoU + pixel accuracy computed during validation (north-star
  metric; the reference only had loss),
- loss scalars come back from the step already reduced; no per-step
  blocking allreduce.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.pipeline import HostLoader, ShardedLoader
from ..evaluation.export import save_npy_stack
from ..evaluation.metrics import summarize_confusion
from ..io.checkpoint import CheckpointManager, merge_params, reshape_like
from ..io.logging import get_logger
from ..io.tb import SummaryWriter
from ..losses.combined import CombinedLoss
from ..models import HNED, get_model_cls
from ..ops.colorize import colorize_seg
from ..parallel.mesh import is_primary, make_mesh
from ..utils.meters import StepTimer
from .assemble import denormalize_image, normalize_image
from .rollout import make_rollout_fn
from .state import TrainState, current_lr, epoch_decayed_lr, make_optimizer, set_lr
from .steps import decode_batch, make_eval_step, make_train_step


def _build_model(cfg: Config):
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    cls = get_model_cls(cfg.arch)
    kw = dict(n_channels=cfg.model_in_channels, dtype=dtype, remat=cfg.remat,
              filters_level=tuple(cfg.filters_level))
    if cfg.arch == "ResnetGenerator":
        kw = dict(input_nc=cfg.model_in_channels, ngf=cfg.ngf,
                  norm=cfg.norm, use_dropout=not cfg.no_dropout,
                  init_type=cfg.init_type, init_gain=cfg.init_gain,
                  dtype=dtype)
    return cls(**kw)


class Trainer:
    def __init__(self, cfg: Config, dataset_train=None, dataset_val=None):
        self.cfg = cfg
        if cfg.path:
            os.makedirs(cfg.path, exist_ok=True)
        self.logger = get_logger(
            os.path.join(cfg.path, "experiment.log") if cfg.path else None,
            process=jax.process_index())
        self.logger.info("Initializing trainer")

        self.mesh = make_mesh(shape=cfg.mesh_shape)
        self.n_devices = self.mesh.devices.size
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None

        # --- models ------------------------------------------------------
        self.model = _build_model(cfg)
        rng = jax.random.key(cfg.seed)
        h, w = cfg.image_size
        sample_x = jnp.zeros((1, h, w, cfg.model_in_channels), jnp.float32)
        self.params = jax.jit(self.model.init)(rng, sample_x)

        self.hned = HNED(dtype=dtype) if cfg.edge else None
        if self.hned is not None:
            if cfg.hed_weights:
                from ..io.weights import load_hned_params
                self.hned_params = load_hned_params(cfg.hed_weights)
            else:
                self.hned_params = jax.jit(self.hned.init)(
                    jax.random.key(0), jnp.zeros((1, h, w, 3), jnp.float32))
        else:
            self.hned_params = None

        # --- losses ------------------------------------------------------
        self.combined = CombinedLoss.create(cfg.vgg_weights, dtype,
                                            image_hw=cfg.image_size)

        # --- optimizer / state ------------------------------------------
        mu_dt = (jnp.bfloat16 if cfg.adam_mu_dtype == "bfloat16" else None)
        tx = make_optimizer(cfg.optimizer, cfg.lr, cfg.beta1,
                            moment_dtype=mu_dt)
        gen_state = TrainState.create(self.params, tx)
        if cfg.gan_train:
            from .gan import GanTrainState
            self.disc = self._build_discriminator(cfg, dtype)
            d_vars = dict(jax.jit(self.disc.init)(
                jax.random.key(1), jnp.zeros((1, h, w, 9), jnp.float32)))
            # BatchNorm running stats live outside the optimized params
            disc_stats = d_vars.pop("batch_stats", None)
            d_tx = make_optimizer(cfg.optimizer, cfg.lr, cfg.beta1)
            self.state = GanTrainState(gen=gen_state,
                                       disc=TrainState.create(d_vars,
                                                              d_tx),
                                       disc_stats=disc_stats)
        else:
            self.disc = None
            self.state = gen_state
        self.epoch = 0
        self.global_step = 0

        # --- checkpointing ----------------------------------------------
        ckpt_dir = os.path.join(cfg.path, "checkpoint") if cfg.path else None
        self.ckpt = CheckpointManager(ckpt_dir) if ckpt_dir else None
        if cfg.ckpt:  # warm-start weights only, key-gated intersection
            # (reference src/trainer.py:65-76 loads only ckpt keys present in
            # the live model — the cross-arch warm-start contract)
            self.logger.info("Loading from ckpt %s" % cfg.ckpt)
            tree = CheckpointManager.restore_path(cfg.ckpt)

            def _merge(live_params, restored, tag):
                merged, rep = merge_params(live_params, restored)
                self.logger.info(
                    "%s warm start: %d loaded, %d missing (kept init), "
                    "%d unexpected, %d shape-mismatched", tag,
                    len(rep["loaded"]), len(rep["missing"]),
                    len(rep["unexpected"]), len(rep["shape_mismatch"]))
                for kind in ("missing", "unexpected", "shape_mismatch"):
                    for p in rep[kind]:
                        self.logger.info("  %s: %s", kind, p)
                if not rep["loaded"]:
                    raise ValueError(
                        f"ckpt {cfg.ckpt} shares no parameters with the "
                        f"live {cfg.arch} model")
                return merged

            if cfg.gan_train:
                gen = self.state.gen.replace(
                    params=_merge(self.state.gen.params, tree["params"],
                                  "generator"))
                disc = self.state.disc
                if "disc_params" in tree:
                    disc = disc.replace(
                        params=_merge(disc.params, tree["disc_params"],
                                      "discriminator"))
                self.state = self.state.replace(gen=gen, disc=disc)
            else:
                self.state = self.state.replace(
                    params=_merge(self.state.params, tree["params"],
                                  "model"))
        if cfg.resume:
            self.load_checkpoint(cfg.resume)

        # --- steps -------------------------------------------------------
        model_apply = self.model.apply
        packed_ok = cfg.arch in ("GridNet", "CoordGridNet") and not cfg.remat
        if cfg.fast_train and packed_ok:
            from ..models.fast_gridnet import make_packed_gridnet_apply
            model_apply = make_packed_gridnet_apply(
                dtype=dtype, coord_in=(cfg.arch == "CoordGridNet"))
        hned_apply = self.hned.apply if self.hned is not None else None
        if cfg.gan_train:
            if cfg.multistep_k > 1:
                raise ValueError("multistep_k > 1 is not supported with "
                                 "gan_train (single-step adversarial loss)")
            if cfg.scheduled_sampling > 0:
                raise ValueError("scheduled_sampling is not supported with "
                                 "gan_train (single-step adversarial loss)")
            from .gan import make_gan_train_step
            self._train_step = make_gan_train_step(
                model_apply, self.disc.apply, hned_apply, self.combined,
                cfg.gan_mode, cfg.w_l1, cfg.w_style, cfg.w_seg,
                disc_batch_stats=(self.disc.norm == "batch"))
        elif cfg.multistep_k > 1:
            if cfg.scheduled_sampling > 0:
                raise ValueError("scheduled_sampling and multistep_k > 1 "
                                 "are separate rollout-fidelity objectives; "
                                 "pick one")
            from .multistep import make_multistep_train_step
            self._train_step = make_multistep_train_step(
                model_apply, hned_apply, self.combined, cfg.multistep_k,
                cfg.w_l1, cfg.w_style, cfg.w_seg,
                remat_steps=cfg.multistep_remat,
                discount=cfg.multistep_discount,
                feedback_noise=cfg.multistep_feedback_noise,
                layout_noise=cfg.multistep_layout_noise,
                image_weight=cfg.multistep_image_weight,
                image_discount=cfg.multistep_image_discount)
        elif cfg.scheduled_sampling > 0:
            from .scheduled import make_scheduled_train_step, scheduled_p
            _ss_step = make_scheduled_train_step(
                model_apply, hned_apply, self.combined,
                cfg.w_l1, cfg.w_style, cfg.w_seg)
            self._ss_p = scheduled_p(0, cfg.scheduled_sampling,
                                     cfg.scheduled_ramp)
            # p rides along as a traced scalar: the ramp never recompiles
            self._train_step = (lambda st, hp, b, rng: _ss_step(
                st, hp, b, rng, jnp.float32(self._ss_p)))
        else:
            self._train_step = make_train_step(
                model_apply, hned_apply, self.combined,
                cfg.w_l1, cfg.w_style, cfg.w_seg)
        self._epoch_fn = None
        self._chunk_fn = None
        if cfg.epoch_scan or cfg.chunk_steps > 1:
            if cfg.gan_train:
                raise ValueError("epoch_scan / chunk_steps need a non-GAN "
                                 "trainer (scan carries one TrainState)")
            if cfg.scheduled_sampling > 0:
                raise ValueError("scheduled_sampling is per-step only (its "
                                 "p-ramp changes the program across epochs)")
            if cfg.multistep_k > 1:
                from .multistep import make_multistep_train_step as _mk
                raw = _mk(model_apply, hned_apply, self.combined,
                          cfg.multistep_k, cfg.w_l1, cfg.w_style, cfg.w_seg,
                          remat_steps=cfg.multistep_remat, jit=False,
                          discount=cfg.multistep_discount,
                          feedback_noise=cfg.multistep_feedback_noise,
                          layout_noise=cfg.multistep_layout_noise,
                          image_weight=cfg.multistep_image_weight,
                          image_discount=cfg.multistep_image_discount)
            else:
                raw = make_train_step(model_apply, hned_apply, self.combined,
                                      cfg.w_l1, cfg.w_style, cfg.w_seg,
                                      jit=False)
            self._raw_step_for_scan = raw  # renderer attaches after loaders
        if cfg.epoch_scan and not cfg.device_data:
            raise ValueError("epoch_scan requires device_data=True "
                             "(use chunk_steps for host-fed data)")
        if cfg.chunk_steps > 1:
            if cfg.device_data:
                raise ValueError("chunk_steps is the host-fed executor; "
                                 "device_data already has epoch_scan")
            from .chunk_scan import make_chunk_scan
            self._chunk_fn = make_chunk_scan(self._raw_step_for_scan)
        self._eval_step = make_eval_step(
            model_apply, hned_apply, self.combined.eval_variant(),
            cfg.w_l1, cfg.w_style, cfg.w_seg, n_classes=cfg.n_classes)
        fast_ok = cfg.fast_rollout and cfg.arch in ("GridNet",
                                                    "CoordGridNet")
        if fast_ok and not cfg.edge:
            # fully-packed loop (8ch contract): feedback stays in
            # space-to-depth space for the whole scan
            from ..models.fast_gridnet import make_packed_rollout_fn
            packed_ro = make_packed_rollout_fn(
                n_frames=cfg.rollout_frames, dtype=dtype,
                coord_in=(cfg.arch == "CoordGridNet"),
                upsample=cfg.rollout_upsample)
            self._rollout = (lambda p, hp, a, b, c, d:
                             packed_ro(p, a, b, c, d))
        else:
            rollout_apply = model_apply
            if fast_ok:
                from ..models.fast_gridnet import make_edge_rollout_apply
                # batch-adaptive row-0 scheme for the edge-mode rollout
                # (see make_edge_rollout_apply: 2x2 wins b32-b64, 1x2
                # elsewhere). The rollout-only upsample knob applies
                # here too (this apply is built solely for the rollout
                # path).
                rollout_apply = make_edge_rollout_apply(
                    dtype=dtype, coord_in=(cfg.arch == "CoordGridNet"),
                    upsample=cfg.rollout_upsample)
            self._rollout = make_rollout_fn(
                rollout_apply, hned_apply, n_frames=cfg.rollout_frames,
                use_edges=cfg.edge, edge_scale=cfg.rollout_edge_scale)

        # --- data --------------------------------------------------------
        if dataset_train is None:
            dataset_train, dataset_val = self._default_datasets()
        if cfg.device_data:
            if not hasattr(dataset_train, "scene_table"):
                raise ValueError("device_data=True needs a dataset exposing "
                                 "scene_table() (synthetic only)")
            if jax.process_count() > 1:
                raise ValueError("device_data is single-process only")
            from ..data.device_synthetic import DeviceSyntheticLoader
            self.train_loader = DeviceSyntheticLoader(
                dataset_train, cfg.batch_size, mesh=self.mesh, seed=cfg.seed,
                n_frames=(cfg.multistep_k + 2 if cfg.multistep_k > 1 else 3))
            if cfg.epoch_scan:
                from .epoch_scan import make_epoch_scan
                self._epoch_fn = make_epoch_scan(self.train_loader._render,
                                                 self._raw_step_for_scan)
        else:
            self.train_loader = self._wrap_loader(dataset_train, shuffle=True)
        self.val_loader = self._wrap_loader(dataset_val, shuffle=False)

        # --- observability ----------------------------------------------
        tb_dir = cfg.path if (cfg.path and is_primary()) else None
        self.writer = SummaryWriter(tb_dir, enabled=tb_dir is not None)
        self.predict_dir = (os.path.join(cfg.path, "predict")
                            if cfg.path else None)
        self.logger.debug("Finish init trainer (devices=%d, params=%d)" % (
            self.n_devices,
            sum(x.size for x in jax.tree_util.tree_leaves(self.params))))

    # ------------------------------------------------------------------
    @property
    def model_params(self):
        """Generator params regardless of plain/GAN training mode."""
        return (self.state.gen.params if self.cfg.gan_train
                else self.state.params)

    @staticmethod
    def _build_discriminator(cfg, dtype):
        from ..models import NLayerDiscriminator, PixelDiscriminator
        if cfg.netD == "basic":
            return NLayerDiscriminator(9, cfg.ndf, n_layers=3, norm=cfg.norm,
                                       init_type=cfg.init_type,
                                       init_gain=cfg.init_gain, dtype=dtype)
        if cfg.netD == "n_layers":
            return NLayerDiscriminator(9, cfg.ndf, n_layers=cfg.n_layers_D,
                                       norm=cfg.norm, init_type=cfg.init_type,
                                       init_gain=cfg.init_gain, dtype=dtype)
        if cfg.netD == "pixel":
            return PixelDiscriminator(9, cfg.ndf, norm=cfg.norm,
                                      init_type=cfg.init_type,
                                      init_gain=cfg.init_gain, dtype=dtype)
        raise ValueError(f"unknown netD {cfg.netD!r}")

    def _default_datasets(self):
        from ..data import get_dataset
        return get_dataset(self.cfg)

    def _wrap_loader(self, dataset, shuffle: bool):
        # cfg.batch_size is GLOBAL (the reference splits batch_size // gpus
        # per process, src/trainer.py:148); each process loads its share and
        # ShardedLoader assembles the global array across processes
        n_proc = jax.process_count()
        if self.cfg.batch_size % n_proc:
            raise ValueError(f"batch_size {self.cfg.batch_size} not "
                             f"divisible by process count {n_proc}")
        host = HostLoader(dataset, self.cfg.batch_size // n_proc,
                          shuffle=shuffle,
                          seed=self.cfg.seed, workers=self.cfg.workers,
                          process_index=jax.process_index(),
                          process_count=n_proc,
                          transfer_uint8=(self.cfg.transfer_uint8
                                          and self.cfg.n_classes <= 255))
        return ShardedLoader(host, self.mesh,
                             put_thread=self.cfg.put_thread)

    # ------------------------------------------------------------------
    def set_epoch(self, epoch: int):
        self.logger.info("Start of epoch %d" % (epoch + 1))
        self.epoch = epoch + 1
        self.train_loader.set_epoch(epoch)
        self.val_loader.set_epoch(epoch)
        cfg = self.cfg
        if cfg.scheduled_sampling > 0:
            from .scheduled import scheduled_p
            self._ss_p = scheduled_p(epoch, cfg.scheduled_sampling,
                                     cfg.scheduled_ramp)
        lr = None
        # pix2pix scheduler policies (reference src/models/networks.py:38-64)
        if cfg.lr_policy == "linear":
            from .schedules import linear_lr
            lr = linear_lr(cfg.lr, epoch, cfg.epoch_count, cfg.niter,
                           cfg.niter_decay)
        elif cfg.lr_policy == "step":
            from .schedules import step_lr
            lr = step_lr(cfg.lr, epoch, cfg.lr_decay_iters)
        elif cfg.lr_policy == "cosine":
            from .schedules import cosine_lr
            lr = cosine_lr(cfg.lr, epoch, cfg.niter)
        elif cfg.optimizer == "sgd":  # reference set_epoch intent (§2c#8)
            lr = epoch_decayed_lr(cfg.lr, epoch, cfg.lr_decay_step,
                                  cfg.lr_decay_gamma)
        if lr is not None:
            self._apply_lr(lr)

    def _apply_lr(self, lr: float):
        if self.cfg.gan_train:
            self.state = self.state.replace(
                gen=set_lr(self.state.gen, lr),
                disc=set_lr(self.state.disc, lr))
            lr_now = current_lr(self.state.gen)
        else:
            self.state = set_lr(self.state, lr)
            lr_now = current_lr(self.state)
        if is_primary():
            self.writer.add_scalar("other/lr-epoch", lr_now, self.epoch)

    def train(self):
        self.logger.info("Training started")
        cfg = self.cfg
        if self._epoch_fn is not None:
            return self._train_epoch_scan()
        if self._chunk_fn is not None:
            return self._train_chunked()
        timer = StepTimer()
        n_batches = len(self.train_loader)
        base_key = jax.random.key(cfg.seed)  # one device op per epoch
        for i, batch in enumerate(self.train_loader):
            timer.mark_loaded()
            self.global_step += 1
            rng = jax.random.fold_in(base_key, self.global_step)
            self.state, metrics = self._train_step(
                self.state, self.hned_params, batch, rng)
            if is_primary() and i % cfg.print_freq == 0:
                # host sync only on logged steps
                loss = float(metrics["loss"])
                timer.mark_computed()
                self.logger.info(
                    "Epoch [%d/%d][%d/%d] load [%.3fs] comp [%.3fs] "
                    "loss [%.4f]" % (self.epoch, cfg.epochs, i + 1,
                                     n_batches, timer.load_time,
                                     timer.comp_time, loss))
                self.writer.add_scalar("train/loss", loss, self.global_step)
                for k in ("loss_l1", "loss_style", "loss_seg", "loss_gan",
                          "loss_d"):
                    if k in metrics:
                        self.writer.add_scalar(
                            f"train/{k}", float(metrics[k]),
                            self.global_step)
                # image grids are the expensive log (extra eval forward);
                # gate them on disp_interval (reference parsed but never
                # consumed it, src/main.py:133-135)
                if (self.writer._w is not None
                        and i % max(cfg.disp_interval, 1) == 0):
                    self._log_train_images(batch)
            else:
                timer.mark_computed()
        # epoch-end sync: fetch one scalar so every dispatched step has
        # completed before the caller proceeds/exits (block_until_ready is a
        # no-op on tunneled devices; exiting with in-flight RPCs can wedge
        # the remote server)
        self.logger.debug("epoch drained at step %d"
                          % int(self.state.step if not self.cfg.gan_train
                                else self.state.gen.step))

    def _train_chunked(self):
        """Host-fed chunked dispatch (train/chunk_scan.py): K batches per
        upload, K steps per compiled program, one fetch per chunk — K-fold
        fewer host round trips than the per-step loop, with the identical
        fold_in RNG stream (tests/test_chunk_scan.py proves the trajectory
        matches)."""
        cfg = self.cfg
        from .chunk_scan import (iter_chunks, put_batch, put_chunk,
                                 stack_batches)
        base_key = jax.random.key(cfg.seed)
        k = cfg.chunk_steps
        n_batches = len(self.train_loader)
        done = 0
        t0 = time.time()
        for chunk in iter_chunks(self.train_loader.loader, k):
            if len(chunk) == k:
                dev = put_chunk(stack_batches(chunk), self.mesh)
                self.state, losses = self._chunk_fn(
                    self.state, self.hned_params, dev, base_key,
                    jnp.int32(self.global_step))
                self.global_step += k
                losses = np.asarray(losses)  # fetch = chunk sync
            else:
                # tail shorter than K: reuse the per-step program instead of
                # compiling a second scan shape
                losses = []
                for host_batch in chunk:
                    b = put_batch(host_batch, self.mesh)
                    self.global_step += 1
                    rng = jax.random.fold_in(base_key, self.global_step)
                    self.state, metrics = self._train_step(
                        self.state, self.hned_params, b, rng)
                    losses.append(float(metrics["loss"]))
                losses = np.asarray(losses)
            done += len(losses)
            if is_primary():
                wall = time.time() - t0
                self.logger.info(
                    "Epoch [%d/%d][%d/%d] chunked %.1f ms/step "
                    "loss [%.4f]" % (self.epoch, cfg.epochs, done, n_batches,
                                     wall * 1e3 / max(done, 1),
                                     float(losses.mean())))
                self.writer.add_scalar("train/loss", float(losses.mean()),
                                       self.global_step)

    def _train_epoch_scan(self):
        """Whole epoch in one compiled scan (train/epoch_scan.py): one
        dispatch, one fetch; per-step losses come back as a stack."""
        cfg = self.cfg
        idx_all = jnp.asarray(self.train_loader.epoch_indices())
        if self.n_devices > 1:  # shard each scan step's batch over 'data'
            from jax.sharding import NamedSharding, PartitionSpec as P
            idx_all = jax.device_put(
                idx_all, NamedSharding(self.mesh, P(None, "data")))
        t0 = time.time()
        base_key = jax.random.key(cfg.seed)
        self.state, losses = self._epoch_fn(
            self.state, self.hned_params, idx_all, base_key,
            jnp.int32(self.global_step))
        self.global_step += idx_all.shape[0]
        losses = np.asarray(losses)  # fetch = epoch-end sync
        wall = time.time() - t0
        if is_primary():
            self.logger.info(
                "Epoch [%d/%d] scanned %d steps in %.2fs (%.1f ms/step) "
                "loss first [%.4f] last [%.4f] mean [%.4f]" % (
                    self.epoch, cfg.epochs, len(losses), wall,
                    wall * 1e3 / max(len(losses), 1), losses[0], losses[-1],
                    float(losses.mean())))
            self.writer.add_scalar("train/loss", float(losses.mean()),
                                   self.global_step)
        self.logger.debug("epoch drained at step %d" % int(self.state.step))

    def _log_train_images(self, batch):
        """TB image grids like the reference (src/trainer.py:282-286):
        GT frame, generated frame, GT seg, predicted seg (colorized), and
        the predicted-frame edge map."""
        from .multistep import is_window_batch, window_to_triplet_batch
        if is_window_batch(batch):
            batch = window_to_triplet_batch(batch)
        _, seg_ids, img_n = self._eval_step(self.model_params,
                                            self.hned_params, batch)
        batch = decode_batch(batch)
        step = self.global_step
        self.writer.add_image("train/img gt", np.asarray(batch["img3"]),
                              step)
        self.writer.add_image("train/img",
                              np.asarray(denormalize_image(img_n)), step)
        self.writer.add_image("train/seg gt", np.asarray(
            colorize_seg(batch["seg3"], self.cfg.n_classes)), step)
        self.writer.add_image("train/seg", np.asarray(
            colorize_seg(seg_ids, self.cfg.n_classes)), step)
        if self.hned is not None:
            edge = self.hned.apply(self.hned_params,
                                   denormalize_image(img_n))[-1]
            self.writer.add_image(
                "train/edge", np.repeat(np.asarray(edge), 3, axis=-1), step)

    def validate(self) -> Dict[str, float]:
        """Validation epoch: size-weighted loss + confusion-matrix totals.

        Both are reduced over the GLOBAL batch inside the jitted eval step
        and come back replicated, so accumulating them per process gives
        identical cross-process totals — the TPU-native equivalent of the
        reference's size-weighted validation all_reduce
        (src/trainer.py:336-340). Accumulation stays on device (lazy jnp
        adds); the only host syncs are the epoch-end fetch and the periodic
        dump."""
        self.logger.info("Validation started")
        cfg = self.cfg
        loss_sum = None
        n_total = 0
        cm_total = None
        for i, batch in enumerate(self.val_loader):
            metrics, seg_ids, img_n = self._eval_step(
                self.model_params, self.hned_params, batch)
            # global batch size: arrays span all processes (packed or dict)
            bs = next(iter(batch.values())).shape[0]
            n_total += bs
            contrib = metrics["loss"] * bs
            loss_sum = contrib if loss_sum is None else loss_sum + contrib
            cm = metrics["cm"]
            cm_total = cm if cm_total is None else cm_total + cm
            if self.predict_dir and i % 100 == 0:
                self._dump_val_stack(batch, seg_ids, img_n, i)
        if cm_total is None:  # empty loader (batch > dataset with drop_last)
            self.logger.info("Validation loader produced no batches")
        iou, miou, acc = summarize_confusion(cm_total, cfg.n_classes)
        if cm_total is None:
            return {"loss": float("nan"), "miou": miou, "pixel_acc": acc,
                    "per_class_iou": iou}
        loss_avg = float(loss_sum) / n_total
        if is_primary():
            self.logger.info(
                "Epoch [%d/%d] loss [%.4f] mIoU [%.4f] pixAcc [%.4f]" % (
                    self.epoch, cfg.epochs, loss_avg, miou, acc))
            self.writer.add_scalar("val/loss", loss_avg, self.epoch)
            self.writer.add_scalar("val/miou", miou, self.epoch)
            self.writer.add_scalar("val/pixel_acc", acc, self.epoch)
        return {"loss": loss_avg, "miou": miou, "pixel_acc": acc,
                "per_class_iou": iou}

    def _dump_val_stack(self, batch, seg_ids, img_n, i: int):
        """Full input+prediction dump, reference parity
        (src/trainer.py:348-351): channel-cat of normalized frame1/2/3, the
        normalized prediction, seg1, seg2, seg3, and the predicted seg —
        16 channels. Multi-host: batch arrays are sharded across processes,
        so every process joins the allgather and only primary writes."""
        batch = decode_batch(batch)
        stack = jnp.concatenate([
            normalize_image(batch["img1"]),
            normalize_image(batch["img2"]),
            normalize_image(batch["img3"]),
            img_n,
            batch["seg1"], batch["seg2"],
            batch["seg3"].astype(jnp.float32)[..., None],
            seg_ids.astype(jnp.float32)[..., None],
        ], axis=-1)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            stack = multihost_utils.process_allgather(stack, tiled=True)
        if is_primary():
            save_npy_stack(self.predict_dir,
                           f"val_{time.time():.0f}_{i:06d}",
                           {"stack": np.asarray(stack)})

    # ------------------------------------------------------------------
    def save_checkpoint(self, metrics: Optional[Dict] = None):
        if self.ckpt is None or not is_primary():
            return
        self.logger.info("Saving checkpoint..")
        if self.cfg.gan_train:
            extra = {"disc_params": self.state.disc.params,
                     "disc_opt_state": self.state.disc.opt_state}
            if self.state.disc_stats is not None:
                extra["disc_stats"] = self.state.disc_stats
            self.ckpt.save(
                self.epoch, self.state.gen.params, self.state.gen.opt_state,
                self.global_step, self.cfg.arch, extra=extra)
        else:
            self.ckpt.save(self.epoch, self.state.params,
                           self.state.opt_state, self.global_step,
                           self.cfg.arch)

    def load_checkpoint(self, resume: str):
        self.logger.info("Resuming checkpoint %s" % resume)
        if resume == "latest" and self.ckpt is not None:
            resume = os.path.join(self.ckpt.directory, "latest")
        tree = CheckpointManager.restore_path(resume, arch=self.cfg.arch)
        self.epoch = int(tree["epoch"])
        self.global_step = int(tree.get("step", 0))
        if self.cfg.gan_train:
            gen = self.state.gen.replace(
                params=tree["params"],
                opt_state=reshape_like(self.state.gen.opt_state,
                                       tree["opt_state"]))
            disc = self.state.disc
            if "disc_params" in tree:
                disc = disc.replace(
                    params=tree["disc_params"],
                    opt_state=reshape_like(self.state.disc.opt_state,
                                           tree["disc_opt_state"]))
            self.state = self.state.replace(
                gen=gen, disc=disc,
                disc_stats=tree.get("disc_stats", self.state.disc_stats))
        else:
            self.state = self.state.replace(
                params=tree["params"],
                opt_state=reshape_like(self.state.opt_state,
                                       tree["opt_state"]))
        # Restored leaves are host numpy arrays; a fresh run's state lives
        # on device (jitted init). Upload now so the resumed step runs the
        # SAME compiled program as a fresh run — numpy-backed state hashed
        # to a second program variant (and the tunneled client stalled on
        # that first post-resume dispatch, 2026-08-20).
        self.state = jax.device_put(self.state)
        self.logger.info("Checkpoint loaded")

    # ------------------------------------------------------------------
    def generate_sequence(self, img1, img2, seg1, seg2,
                          save: bool = True):
        """Rollout from normalized (N,H,W,3) frames + (N,H,W,1) layouts."""
        imgs, segs = self._rollout(self.model_params, self.hned_params,
                                   img1, img2, seg1, seg2)
        if save and is_primary() and self.predict_dir:
            full_imgs = np.concatenate(
                [np.asarray(img1)[:, None], np.asarray(img2)[:, None],
                 np.asarray(imgs)], axis=1)
            full_segs = np.concatenate(
                [np.asarray(seg1)[:, None], np.asarray(seg2)[:, None],
                 np.asarray(segs)], axis=1)
            save_npy_stack(self.predict_dir, f"val_{time.time():.0f}",
                           {"img": full_imgs, "seg": full_segs})
        return imgs, segs

    def eval_rollout_fidelity(self):
        """Per-step rollout fidelity on FIXED held-out synthetic scenes —
        the north-star curve, logged during training so runs produce a
        fidelity-vs-epoch trajectory instead of an endpoint number.
        Beyond reference (it only dumps rollout frames qualitatively,
        src/trainer.py:459-476). Held-out seed 4242 matches the campaign
        eval (tools/convergence_run.py), so curves are comparable."""
        cfg = self.cfg
        if cfg.dataset != "synthetic":
            self.logger.info("rollout fidelity tracking needs the "
                             "synthetic dataset (sequence() contract); "
                             "skipping")
            return None
        from ..data.synthetic import SyntheticTriplets
        from ..evaluation.sequence import evaluate_trainer_rollout
        n = cfg.rollout_fidelity_scenes
        ds = SyntheticTriplets(n, cfg.image_size, cfg.n_classes, seed=4242)
        fid = evaluate_trainer_rollout(self, ds, list(range(n)),
                                       n_frames=cfg.rollout_frames)
        if is_primary():
            curve = " ".join(f"{float(v):.4f}" for v in fid["per_step_miou"])
            self.logger.info("Rollout fidelity mean [%.4f] per-step [%s]" % (
                fid["mean_miou"], curve))
            self.writer.add_scalar("val/rollout_fidelity_mean",
                                   fid["mean_miou"], self.epoch)
            for k, v in enumerate(fid["per_step_miou"]):
                self.writer.add_scalar(
                    "val/rollout_fidelity_step%d" % (k + 1), float(v),
                    self.epoch)
        return fid

    def eval_generate_sequence(self, img1_path: str, img2_path: str,
                               seg1_path: str, seg2_path: str):
        """CLI rollout from image paths (reference src/trainer.py:429-450)."""
        from ..data.cityscapes import _load_rgb, _load_seg
        hw = self.cfg.image_size
        try:
            i1 = _load_rgb(img1_path, hw)
            i2 = _load_rgb(img2_path, hw)
            s1 = _load_seg(seg1_path, hw)
            s2 = _load_seg(seg2_path, hw)
        except FileNotFoundError:
            self.logger.debug("path name not exists")
            return None
        img1 = normalize_image(jnp.asarray(i1))[None]
        img2 = normalize_image(jnp.asarray(i2))[None]
        seg1 = jnp.asarray(s1, jnp.float32)[None, ..., None]
        seg2 = jnp.asarray(s2, jnp.float32)[None, ..., None]
        return self.generate_sequence(img1, img2, seg1, seg2)

    # ------------------------------------------------------------------
    def fit(self):
        """Full training run (reference worker loop, src/main.py:76-82);
        honors ``val_interval`` (parsed but unused in the reference)."""
        plateau = None
        if self.cfg.lr_policy == "plateau":
            from .schedules import PlateauScheduler
            plateau = PlateauScheduler(self.cfg.lr)
        metrics = {}
        # self.epoch is the 1-indexed count of completed epochs (0 fresh,
        # restored from the checkpoint on --resume), so it doubles as the
        # 0-indexed id of the next epoch to run.
        for epoch in range(self.epoch, self.cfg.epochs):
            self.set_epoch(epoch)
            self.train()
            if (epoch + 1) % max(self.cfg.val_interval, 1) == 0:
                metrics = self.validate()
                if plateau is not None:
                    self._apply_lr(plateau.update(metrics["loss"]))
            if (self.cfg.rollout_fidelity_every > 0
                    and (epoch + 1) % self.cfg.rollout_fidelity_every == 0):
                self.eval_rollout_fidelity()
            self.save_checkpoint(metrics)
        return metrics

"""Serving API: load a checkpoint, generate layout/frame futures.

The production-inference counterpart to the CLI rollout mode (reference
src/main.py:64-67): one object owns the compiled fully-packed rollout
program and answers batched requests at a fixed shape (requests are padded
to the compiled batch, so there is exactly one compilation per
(batch, resolution, n_frames) signature).

Example:
    predictor = LayoutPredictor.from_checkpoint("/exp/checkpoint/latest",
                                                arch="GridNet")
    frames, layouts = predictor.predict(img1, img2, seg1, seg2)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .io.checkpoint import CheckpointManager
from .models import get_model_cls
from .models.fast_gridnet import make_packed_rollout_fn
from .train.assemble import denormalize_image, normalize_image
from .train.rollout import make_rollout_fn


class LayoutPredictor:
    def __init__(self, arch: str, params, n_frames: int = 8,
                 batch: int = 16, image_hw=(256, 256),
                 filters_level=(32, 64, 96), use_bf16: bool = True,
                 hned=None, hned_params=None, use_edges: bool = False,
                 edge_scale: int = 1, quantize_transfer: bool = False,
                 n_classes: int = 20, upsample: str = "bilinear"):
        if arch not in ("GridNet", "CoordGridNet"):
            raise ValueError(f"serving supports GridNet archs, got {arch}")
        self.arch = arch
        self.params = params
        self.n_frames = n_frames
        self.batch = batch
        # uint8 device->host transfer: 4x less traffic on tunneled/remote
        # devices at 1/255 quantization of the [0,1] frames
        self.quantize_transfer = quantize_transfer
        # the layout fetch is exact only while every class id fits in uint8
        self.n_classes = n_classes
        self.hw = tuple(image_hw)
        dtype = jnp.bfloat16 if use_bf16 else None
        coord = arch == "CoordGridNet"
        if use_edges:
            if hned is None:
                raise ValueError("use_edges requires an HNED model")
            model = get_model_cls(arch)(n_channels=10,
                                        filters_level=tuple(filters_level),
                                        dtype=dtype)
            ro = make_rollout_fn(model.apply, hned.apply,
                                 n_frames=n_frames, use_edges=True,
                                 edge_scale=edge_scale)
            self._rollout = lambda p, a, b, c, d: ro(p, hned_params,
                                                     a, b, c, d)
        else:
            ro = make_packed_rollout_fn(n_frames=n_frames, dtype=dtype,
                                        coord_in=coord, upsample=upsample)
            self._rollout = lambda p, a, b, c, d: ro(p, a, b, c, d)

    @classmethod
    def from_checkpoint(cls, path: str, arch: str = "GridNet",
                        **kw) -> "LayoutPredictor":
        tree = CheckpointManager.restore_path(path)
        if "arch" in tree and tree["arch"] not in (arch, None):
            arch = tree["arch"]
        return cls(arch, tree["params"], **kw)

    def predict(self, img1: np.ndarray, img2: np.ndarray,
                seg1: np.ndarray, seg2: np.ndarray
                ) -> Tuple[np.ndarray, np.ndarray]:
        """img*: (N, H, W, 3) RGB in [0,1]; seg*: (N, H, W) int class ids.
        Returns (frames (N, T, H, W, 3) in [0,1], layouts (N, T, H, W))."""
        n = img1.shape[0]
        if n > self.batch:
            raise ValueError(f"request batch {n} > compiled batch "
                             f"{self.batch}; shard the request")

        def pad(x):
            if x.shape[0] == self.batch:
                return x
            reps = np.concatenate(
                [x, np.repeat(x[-1:], self.batch - x.shape[0], axis=0)])
            return reps

        i1 = normalize_image(jnp.asarray(pad(np.asarray(img1, np.float32))))
        i2 = normalize_image(jnp.asarray(pad(np.asarray(img2, np.float32))))
        s1 = jnp.asarray(pad(np.asarray(seg1, np.float32)))[..., None]
        s2 = jnp.asarray(pad(np.asarray(seg2, np.float32)))[..., None]
        imgs, segs = self._rollout(self.params, i1, i2, s1, s2)
        # slice the padding off DEVICE-side before fetching: on a tunneled
        # device the host transfer dominates small-batch latency (measured
        # 7.1 s for the padded batch-16 fetch vs 1.5 s for batch 1)
        fdev = jnp.clip(denormalize_image(imgs[:n]), 0.0, 1.0)
        ldev = segs[:n, ..., 0]
        if self.quantize_transfer:
            frames = np.asarray((fdev * 255.0 + 0.5).astype(jnp.uint8),
                                np.float32) / 255.0
            if self.n_classes <= 256:
                layouts = np.asarray(ldev.astype(jnp.uint8)).astype(np.int32)
            else:
                # ids >= 256 would wrap in uint8 — keep the layout fetch exact
                layouts = np.asarray(ldev).astype(np.int32)
        else:
            frames = np.asarray(fdev)
            layouts = np.asarray(ldev).astype(np.int32)
        return frames, layouts

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
from .models.fast_gridnet import make_packed_rollout_fn, rollout_jit
from .train.assemble import denormalize_image, normalize_image
from .train.rollout import make_rollout_fn


class LayoutPredictor:
    def __init__(self, arch: str, params, n_frames: int = 8,
                 batch: int = 16, image_hw=(256, 256),
                 filters_level=(32, 64, 96), use_bf16: bool = True,
                 hned=None, hned_params=None, use_edges: bool = False,
                 edge_scale: int = 1, quantize_transfer: bool = False,
                 n_classes: int = 20, upsample: str = "bilinear",
                 mesh=None):
        if arch not in ("GridNet", "CoordGridNet"):
            raise ValueError(f"serving supports GridNet archs, got {arch}")
        self.arch = arch
        # multi-device serving: shard the request batch over the mesh's
        # 'data' axis with replicated params — the serving counterpart of
        # the reference's optional nn.DataParallel eval (src/val.py:130-131)
        self.mesh = mesh
        if mesh is not None:
            if batch % mesh.size != 0:
                raise ValueError(f"compiled batch {batch} must be divisible "
                                 f"by the mesh size {mesh.size}")
            from .parallel.mesh import replicated_sharding
            rep = replicated_sharding(mesh)
            params = jax.device_put(params, rep)
            if hned_params is not None:
                hned_params = jax.device_put(hned_params, rep)
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
                                 edge_scale=edge_scale, jit=False)
            rollout = lambda p, a, b, c, d: ro(p, hned_params, a, b, c, d)
        else:
            ro = make_packed_rollout_fn(n_frames=n_frames, dtype=dtype,
                                        coord_in=coord, upsample=upsample,
                                        jit=False)
            rollout = ro
        self._rollout = rollout_jit(rollout)  # kept for direct callers

        # Whole request as ONE compiled program with ONE packed input
        # upload and ONE packed output fetch: on remote/tunneled devices
        # each host<->device array op is a serial round-trip, and the
        # previous 4-upload/2-fetch predict() spent ~6 RTTs per request
        # (measured ~300-400 ms at ~40 ms tunnel RTT vs ~15 ms of device
        # compute). ``n`` (the unpadded request size) is static, so each
        # distinct request batch compiles once.
        # quantize both directions: the upload carries frames at 1/255
        # (training's transfer_uint8 semantics; layout ids exact) and the
        # fetch returns uint8 frames+ids — 4x less tunnel traffic each way.
        # n_classes > 256 would wrap ids in uint8 -> full-precision both ways.
        quantize = quantize_transfer and n_classes <= 256

        def serve(p, x, n):
            if quantize:
                x = x.astype(jnp.float32)
                x = jnp.concatenate([x[..., 0:6] / 255.0, x[..., 6:8]], -1)
            i1 = normalize_image(x[..., 0:3])
            i2 = normalize_image(x[..., 3:6])
            s1, s2 = x[..., 6:7], x[..., 7:8]
            imgs, segs = rollout(p, i1, i2, s1, s2)
            f = jnp.clip(denormalize_image(imgs[:n]), 0.0, 1.0)
            l = segs[:n]
            if quantize:
                return jnp.concatenate(
                    [(f * 255.0 + 0.5).astype(jnp.uint8),
                     l.astype(jnp.uint8)], axis=-1)
            return jnp.concatenate([f, l.astype(jnp.float32)], axis=-1)

        self._quantized_serve = quantize
        self._serve = rollout_jit(serve, static_argnums=(2,))

    @classmethod
    def from_checkpoint(cls, path: str, arch: str = "GridNet",
                        **kw) -> "LayoutPredictor":
        tree = CheckpointManager.restore_path(path)
        if "arch" in tree and tree["arch"] not in (arch, None):
            arch = tree["arch"]
        return cls(arch, tree["params"], **kw)

    def _pack_request(self, img1, img2, seg1, seg2):
        """Host-side packing of one request into the single upload array."""
        n = img1.shape[0]
        if n > self.batch:
            raise ValueError(f"request batch {n} > compiled batch "
                             f"{self.batch}; shard the request")

        def pad(x):
            if x.shape[0] == self.batch:
                return x
            return np.concatenate(
                [x, np.repeat(x[-1:], self.batch - x.shape[0], axis=0)])

        x = np.concatenate(
            [pad(np.asarray(img1, np.float32)),
             pad(np.asarray(img2, np.float32)),
             pad(np.asarray(seg1, np.float32))[..., None],
             pad(np.asarray(seg2, np.float32))[..., None]], axis=-1)
        if self._quantized_serve:
            x = np.concatenate(
                [x[..., 0:6] * 255.0 + 0.5, x[..., 6:8]],
                axis=-1).astype(np.uint8)
        return x, n

    def _put(self, x: np.ndarray):
        """Upload one packed request, batch-sharded when serving on a
        mesh."""
        if self.mesh is not None:
            from .parallel.mesh import batch_sharding
            return jax.device_put(x, batch_sharding(self.mesh))
        return jnp.asarray(x)

    def _decode_out(self, out: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Host-side decode of the single fetched array."""
        if self._quantized_serve:
            frames = out[..., :3].astype(np.float32) / 255.0
        else:
            frames = out[..., :3]
        return frames, out[..., 3].astype(np.int32)

    def predict(self, img1: np.ndarray, img2: np.ndarray,
                seg1: np.ndarray, seg2: np.ndarray
                ) -> Tuple[np.ndarray, np.ndarray]:
        """img*: (N, H, W, 3) RGB in [0,1]; seg*: (N, H, W) int class ids.
        Returns (frames (N, T, H, W, 3) in [0,1], layouts (N, T, H, W)).

        One packed upload -> one compiled program -> one packed fetch
        (padding sliced off device-side before the transfer): per-request
        host<->device round-trips, which dominate small-batch latency on
        tunneled/remote devices, are the structural minimum."""
        x, n = self._pack_request(img1, img2, seg1, seg2)
        out = np.asarray(self._serve(self.params, self._put(x), n))
        return self._decode_out(out)

    def predict_pipelined(self, requests, depth: int = 2):
        """Pipelined multi-request inference; yields one (frames, layouts)
        per request, in order.

        JAX dispatch is asynchronous, so keeping ``depth`` requests in
        flight overlaps request i's device->host fetch (the blocking
        ``np.asarray``) with request i+1's upload and compute. On
        remote/tunneled devices, where per-request latency is almost
        entirely transfer + round-trips (BENCH_NOTES.md "Serving request
        path"), steady-state throughput approaches the bandwidth limit
        instead of serializing RTT -> compute -> RTT per request.

        ``requests``: iterable of (img1, img2, seg1, seg2) tuples with the
        ``predict`` contract. Results are bit-identical to per-request
        ``predict`` calls (same compiled program; scheduling only). At most
        ``depth`` requests are outstanding on the device at a time (each
        buffered output is O(batch * n_frames * H * W)).
        """
        if depth < 1:
            raise ValueError(f"depth must be >= 1, got {depth}")
        return self._predict_pipelined(requests, depth)

    def predict_many(self, img1, img2, seg1, seg2, depth: int = 2
                     ) -> Tuple[np.ndarray, np.ndarray]:
        """Auto-batched inference for requests LARGER than the compiled
        batch: splits (N, ...) inputs into compiled-batch chunks, pipelines
        the chunks (``depth`` in flight), and reassembles (N, ...) outputs.
        The single-compile / fixed-shape contract of ``predict`` is kept —
        every chunk runs the same program."""
        n = img1.shape[0]
        b = self.batch
        chunks = ((img1[i:i + b], img2[i:i + b],
                   seg1[i:i + b], seg2[i:i + b])
                  for i in range(0, n, b))
        outs = list(self.predict_pipelined(chunks, depth=depth))
        frames = np.concatenate([f for f, _ in outs])
        layouts = np.concatenate([l for _, l in outs])
        return frames, layouts

    def _predict_pipelined(self, requests, depth: int):
        from collections import deque
        inflight = deque()
        for req in requests:
            if len(inflight) >= depth:
                yield self._decode_out(np.asarray(inflight.popleft()))
            x, n = self._pack_request(*req)
            inflight.append(self._serve(self.params, self._put(x), n))
        while inflight:
            yield self._decode_out(np.asarray(inflight.popleft()))

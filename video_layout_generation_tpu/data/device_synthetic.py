"""On-device synthetic rendering: zero-H2D training data.

The reference (and the host pipeline that replaces it) decodes/renders
samples on CPU workers and ships batches host->device every step — on
remote/tunneled devices that transfer dominates training wall-clock
(BENCH_NOTES "Convergence refresh"). For the synthetic moving-layout
dataset the full generative state is just 7 floats per rectangle, so this
module uploads the scene-parameter table ONCE (~86 KB at 512 samples) and
re-renders batches **inside XLA on the device**: per step only a (B,)
int32 index array leaves the host.

Geometry math mirrors ``SyntheticTriplets._render`` (truncating casts +
the same clipping); the host computes rectangle edges in float64 and the
device in float32, so an edge whose exact position rounds differently can
shift by one pixel in rare cases — parity is test-bounded (mismatching
pixels < 1e-4; tests/test_device_synthetic.py) rather than bitwise.

TPU design: rectangles become broadcasted-iota interval masks composited
with ``where`` in painter's order (no gathers, no dynamic shapes); the
color LUT is a one-hot(seg) @ (C,3) matmul so the whole renderer fuses
into a handful of elementwise kernels feeding the train step directly in
HBM.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.colorize import CITYSCAPES_COLORS


def _render_frames(table_row: jnp.ndarray, ts: jnp.ndarray,
                   hw: Tuple[int, int], n_classes: int):
    """Render one sample at frame times ts -> (imgs (T,H,W,3) f32,
    segs (T,H,W) i32). table_row: (n_shapes, 7)."""
    h, w = hw
    iy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    colors = jnp.asarray(
        CITYSCAPES_COLORS[np.arange(n_classes) % len(CITYSCAPES_COLORS)],
        jnp.float32) / 255.0
    yy = (jnp.arange(h, dtype=jnp.float32) / (h - 1))[:, None, None]
    shade = 0.7 + 0.3 * yy

    def one_frame(t):
        t = t.astype(jnp.float32)
        seg = jnp.zeros((h, w), jnp.int32)
        for i in range(table_row.shape[0]):  # painter's order, static
            cls, cy, cx, hh, ww, vy, vx = (table_row[i, j] for j in range(7))
            y = cy + vy * t
            x = cx + vx * t
            # int() truncates toward zero; values can only go negative
            # past the clip floor, so trunc-then-clip == host math
            y0 = jnp.clip(((y - hh / 2) * h).astype(jnp.int32), 0, h)
            y1 = jnp.clip(((y + hh / 2) * h).astype(jnp.int32), 0, h)
            x0 = jnp.clip(((x - ww / 2) * w).astype(jnp.int32), 0, w)
            x1 = jnp.clip(((x + ww / 2) * w).astype(jnp.int32), 0, w)
            mask = (iy >= y0) & (iy < y1) & (ix >= x0) & (ix < x1)
            seg = jnp.where(mask, cls.astype(jnp.int32), seg)
        img = jax.nn.one_hot(seg, n_classes, dtype=jnp.float32) @ colors
        img = jnp.clip(img * shade, 0.0, 1.0)
        return img, seg

    return jax.vmap(one_frame)(ts)


def make_device_renderer(table: np.ndarray, hw: Tuple[int, int],
                         n_classes: int = 20, stride: int = 3,
                         n_frames: int = 3):
    """Build jitted ``render(idx (B,) i32) -> batch dict`` (triplet
    contract for n_frames == 3, stacked window contract otherwise)."""
    table_dev = jnp.asarray(table)  # uploaded once, captured as a constant
    ts = jnp.arange(n_frames, dtype=jnp.int32) * stride

    def render(idx):
        rows = table_dev[idx]
        imgs, segs = jax.vmap(
            lambda r: _render_frames(r, ts, tuple(hw), n_classes))(rows)
        if n_frames != 3:
            return {"imgs": imgs, "segs": segs}
        return {"img1": imgs[:, 0], "img2": imgs[:, 1], "img3": imgs[:, 2],
                "seg1": segs[:, 0].astype(jnp.float32)[..., None],
                "seg2": segs[:, 1].astype(jnp.float32)[..., None],
                "seg3": segs[:, 2]}

    return jax.jit(render)


class DeviceSyntheticLoader:
    """Train-loader drop-in (set_epoch/len/iter) whose batches are rendered
    on-device: per step the host ships ONE (B,) int32 index array; the
    batch tensors never exist in host memory. Mesh-sharded via the same
    batch sharding as ShardedLoader, so sharded steps consume it
    unchanged."""

    def __init__(self, dataset, batch_size: int, mesh=None, seed: int = 0,
                 n_frames: int = 3, shuffle: bool = True,
                 drop_last: bool = True):
        self.size = len(dataset)
        self.batch_size = batch_size
        self.seed = seed
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.epoch = 0
        self.mesh = mesh
        self._sharding = None
        if mesh is not None:
            from ..parallel.mesh import batch_sharding
            self._sharding = batch_sharding(mesh)
        self._render = make_device_renderer(
            dataset.scene_table(), dataset.hw, dataset.n_classes,
            dataset.stride, n_frames)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self) -> int:
        if self.drop_last:
            return self.size // self.batch_size
        return -(-self.size // self.batch_size)

    def _order(self) -> np.ndarray:
        if self.shuffle:
            rng = np.random.default_rng((self.seed << 16) ^ self.epoch)
            order = rng.permutation(self.size)
        else:
            order = np.arange(self.size)
        if self.drop_last:
            order = order[: len(self) * self.batch_size]
        return order.astype(np.int32)

    def epoch_indices(self) -> np.ndarray:
        """(n_steps, B) shuffled indices for the current epoch — the xs of
        the epoch-as-scan executor (train/epoch_scan.py). Same order as
        iterating this loader."""
        order = self._order()
        n = (len(order) // self.batch_size) * self.batch_size
        return order[:n].reshape(-1, self.batch_size)

    def __iter__(self):
        order = self._order()
        for s in range(0, len(order), self.batch_size):
            idx = order[s:s + self.batch_size]
            if self._sharding is not None:
                idx = jax.device_put(idx, self._sharding)
            yield self._render(idx)

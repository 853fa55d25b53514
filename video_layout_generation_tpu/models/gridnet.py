"""GridNet / CoordGridNet — the main joint frame+layout predictor.

Capability parity with the reference (src/models/gridnet.py): a 3-row x 6-col
grid CNN. Row r runs at 1/2^r spatial scale with filter widths (32, 64, 96).
The first 3 columns fuse lateral + downsampling paths additively; the last 3
fuse lateral + upsampling paths. Two heads read off row 0: segmentation
logits (20ch) and RGB frame (3ch) (src/models/gridnet.py:21-24,58).

TPU design: NHWC activations in a configurable compute dtype (bf16 default),
fp32 params; optional ``remat`` wraps each grid column in jax.checkpoint to
trade FLOPs for HBM when training at high resolution.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .blocks import (CoordLateralBlock, DownSamplingBlock, LateralBlock,
                     UpSamplingBlock)

Dtype = Any


class _EncColumn(nn.Module):
    """One encoder-half grid column: lateral row 0, down+lateral rows 1,2."""
    filters: Sequence[int]
    col: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x0, x1, x2):
        f0, f1, f2 = self.filters
        i, dt = self.col, self.dtype
        x0 = LateralBlock(f0, dtype=dt, name=f"lateral_0{i-1}")(x0)
        x1 = (DownSamplingBlock(f1, dtype=dt, name=f"down_0{i}")(x0)
              + LateralBlock(f1, dtype=dt, name=f"lateral_1{i-1}")(x1))
        x2 = (DownSamplingBlock(f2, dtype=dt, name=f"down_1{i}")(x1)
              + LateralBlock(f2, dtype=dt, name=f"lateral_2{i-1}")(x2))
        return x0, x1, x2


class _DecColumn(nn.Module):
    """One decoder-half grid column: lateral row 2, up+lateral rows 1,0."""
    filters: Sequence[int]
    col: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x0, x1, x2):
        f0, f1, f2 = self.filters
        i, dt = self.col, self.dtype
        x2 = LateralBlock(f2, dtype=dt, name=f"lateral_2{i-1}")(x2)
        x1 = (UpSamplingBlock(f1, dtype=dt, name=f"up_1{i}")(x2)
              + LateralBlock(f1, dtype=dt, name=f"lateral_1{i-1}")(x1))
        x0 = (UpSamplingBlock(f0, dtype=dt, name=f"up_0{i}")(x1)
              + LateralBlock(f0, dtype=dt, name=f"lateral_0{i-1}")(x0))
        return x0, x1, x2


class GridNet(nn.Module):
    """3x6 grid CNN with dual seg/img heads (reference src/models/gridnet.py:7-58)."""
    n_channels: int = 10
    seg_out: int = 20
    img_out: int = 3
    filters_level: Sequence[int] = (32, 64, 96)
    coord_in: bool = False          # True => CoordGridNet input stem
    dtype: Optional[Dtype] = None   # compute dtype for activations
    remat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        f0, f1, f2 = self.filters_level
        dt = self.dtype
        x = x.astype(dt) if dt is not None else x

        LatIn = CoordLateralBlock if self.coord_in else LateralBlock
        x0 = LatIn(f0, shortcut_conv=True, dtype=dt, name="lateral_in")(x)
        x1 = DownSamplingBlock(f1, dtype=dt, name="down_00")(x0)
        x2 = DownSamplingBlock(f2, dtype=dt, name="down_10")(x1)

        n_col = 6
        for i in range(1, n_col):
            cls = _EncColumn if i < n_col / 2 else _DecColumn
            if self.remat:
                cls = nn.remat(cls)
            x0, x1, x2 = cls(self.filters_level, i, dt, name=f"col_{i}")(
                x0, x1, x2)

        seg = LateralBlock(self.seg_out, dtype=dt, name="lateral_out_seg")(x0)
        img = LateralBlock(self.img_out, dtype=dt, name="lateral_out_img")(x0)
        return seg.astype(jnp.float32), img.astype(jnp.float32)


def CoordGridNet(n_channels: int = 10, **kw) -> GridNet:
    """CoordConv input-stem variant (reference src/models/gridnet.py:63-114)."""
    return GridNet(n_channels=n_channels, coord_in=True, **kw)

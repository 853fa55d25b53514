"""GridNet building blocks as flax.linen modules (NHWC).

Capability parity with the reference grid blocks (reference
src/models/modules.py): LateralBlock (PReLU-conv-PReLU-conv with optional
conv shortcut), DownSamplingBlock (stride-2 entry conv), UpSamplingBlock
(align-corners bilinear x2 then convs), and Coord variants that append
normalized coordinate channels before each conv. The reference's hardcoded
256x256 CUDA coordinate grid (src/models/modules.py:69) is replaced by
shape-derived coords (see ops/coords.py).

Design notes (TPU): all convs are 3x3 NHWC so XLA lowers them to implicit-GEMM
on the MXU; the x2 upsample is two tiny matmuls (ops/resize.py) that fuse with
the following conv rather than a gather.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.coords import add_coord_channels
from ..ops.resize import upsample2x_bilinear_align

Dtype = Any


class PReLU(nn.Module):
    """Parametric ReLU with a single shared slope (torch nn.PReLU parity,
    init 0.25)."""
    init_value: float = 0.25

    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.constant(self.init_value), ())
        a = jnp.asarray(a, x.dtype)
        return jnp.where(x >= 0, x, a * x)


def conv3(features: int, strides: int = 1, dtype: Optional[Dtype] = None,
          name: Optional[str] = None) -> nn.Conv:
    return nn.Conv(features, (3, 3), strides=(strides, strides),
                   padding=((1, 1), (1, 1)), dtype=dtype, name=name)


class CoordConv(nn.Module):
    """Conv over input with appended coordinate channels
    (reference src/models/modules.py:99-110)."""
    features: int
    strides: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        return conv3(self.features, self.strides, self.dtype)(
            add_coord_channels(x))


class LateralBlock(nn.Module):
    """PReLU -> conv -> PReLU -> conv, optional conv shortcut
    (reference src/models/modules.py:5-25)."""
    out_ch: int
    shortcut_conv: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        y = PReLU()(x)
        y = conv3(self.out_ch, dtype=self.dtype)(y)
        y = PReLU()(y)
        y = conv3(self.out_ch, dtype=self.dtype)(y)
        if self.shortcut_conv:
            y = y + conv3(self.out_ch, dtype=self.dtype)(x)
        return y


class DownSamplingBlock(nn.Module):
    """PReLU -> stride-2 conv -> PReLU -> conv
    (reference src/models/modules.py:29-42)."""
    out_ch: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        y = PReLU()(x)
        y = conv3(self.out_ch, strides=2, dtype=self.dtype)(y)
        y = PReLU()(y)
        y = conv3(self.out_ch, dtype=self.dtype)(y)
        return y


class UpSamplingBlock(nn.Module):
    """bilinear x2 (align_corners) -> PReLU -> conv -> PReLU -> conv
    (reference src/models/modules.py:44-58)."""
    out_ch: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        y = upsample2x_bilinear_align(x)
        y = PReLU()(y)
        y = conv3(self.out_ch, dtype=self.dtype)(y)
        y = PReLU()(y)
        y = conv3(self.out_ch, dtype=self.dtype)(y)
        return y


class CoordLateralBlock(nn.Module):
    """coordconv -> PReLU -> coordconv, optional coordconv shortcut
    (reference src/models/modules.py:115-135; note: no leading PReLU)."""
    out_ch: int
    shortcut_conv: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        y = CoordConv(self.out_ch, dtype=self.dtype)(x)
        y = PReLU()(y)
        y = CoordConv(self.out_ch, dtype=self.dtype)(y)
        if self.shortcut_conv:
            y = y + CoordConv(self.out_ch, dtype=self.dtype)(x)
        return y


class CoordDownSamplingBlock(nn.Module):
    """(reference src/models/modules.py:139-152)."""
    out_ch: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        y = PReLU()(x)
        y = CoordConv(self.out_ch, strides=2, dtype=self.dtype)(y)
        y = PReLU()(y)
        y = CoordConv(self.out_ch, dtype=self.dtype)(y)
        return y


class CoordUpSamplingBlock(nn.Module):
    """(reference src/models/modules.py:154-168)."""
    out_ch: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        y = upsample2x_bilinear_align(x)
        y = PReLU()(y)
        y = CoordConv(self.out_ch, dtype=self.dtype)(y)
        y = PReLU()(y)
        y = CoordConv(self.out_ch, dtype=self.dtype)(y)
        return y


class WidthPackedConv3x3(nn.Module):
    """3x3 stride-1 SAME conv, param-compatible with ``nn.Conv`` (same
    "kernel"/"bias" names, shapes, and default init), that executes in 1x2
    width-packed space when ``ops.packed.use_w2_dense`` fires — the
    C64-at-high-resolution shapes (HNED/VGG stage 1) where a standard conv
    leaves half the MXU lanes idle. The packing is a free NHWC reshape and
    the packed kernel is an exact re-indexing, so results match the
    standard conv up to bf16 rounding; everything stays on the XLA path
    (elementwise fusion preserved)."""
    features: int
    dtype: Optional[Dtype] = None
    kernel_init: Any = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x):
        from flax.linen import dtypes
        from ..ops.packed import conv3x3_w2, use_w2_dense
        cin = x.shape[-1]
        k = self.param("kernel", self.kernel_init,
                       (3, 3, cin, self.features))
        b = self.param("bias", nn.initializers.zeros_init(),
                       (self.features,))
        # nn.Conv dtype semantics: dtype=None -> promote(x, params)
        x, k, b = dtypes.promote_dtype(x, k, b, dtype=self.dtype)
        if use_w2_dense(x.shape[-2], cin, self.features):
            # packed forward, standard-conv backward (ops/packed.conv3x3_w2)
            return conv3x3_w2(x, k, b)
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype)
        return y + b

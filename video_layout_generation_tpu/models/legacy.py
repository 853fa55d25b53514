"""Legacy segmentation-completion capability layer.

The reference carries a previous codebase generation for masked layout
completion (src/models/simple.py, u_net.py, encoder_decoder.py); the rebuild
subsumes it:

- ``UNet``: classic 4-down/4-up U-Net with BN double convs; forward masks the
  one-hot seg, predicts, and composites the prediction into the masked region
  (reference src/models/u_net.py:96-132).
- ``EncoderDecoder``: strided conv encoder -> 4 dilated convs (d=2,4,8,16) ->
  bottleneck -> bilinear-upsample decoder (reference
  src/models/encoder_decoder.py:7-70).
- ``Simple``: class-id embedding front end (masked ids mapped to a dedicated
  "cropped" class), backbone, composite into the known region, class-weighted
  masked CE (reference src/models/simple.py:11-62).

NHWC layout; BatchNorm threads flax ``batch_stats``.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.one_hot import seg_one_hot
from ..ops.pooling import max_pool_2x2
from ..ops.resize import upsample2x_bilinear_align

Dtype = Any

# Per-class CE weights for the 29-class completion task
# (reference src/models/simple.py:19).
SIMPLE29_CLASS_WEIGHTS = (
    0.19, 0.45, 0.29, 0.13, 0.2, 0.33, 0.48, 0.14, 0.36, 0.34, 1.0, 0.43,
    0.66, 0.33, 0.51, 0.41, 0.17, 0.31, 0.19, 0.33, 0.57, 0.21, 0.48, 0.49,
    0.75, 0.88, 0.49, 0.61, 0.42,
)


class DoubleConv(nn.Module):
    """(conv -> BN -> ReLU) x2 (reference src/models/u_net.py:7-22)."""
    out_ch: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        for i in range(2):
            x = nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype, name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


class UNet(nn.Module):
    """Masked layout completion U-Net (reference src/models/u_net.py:96-132).

    forward(img, seg_onehot, mask): mask==1 marks the *known* region's
    complement per the reference composite ``x*(1-mask) + seg*mask``.
    seg one-hot is (N,H,W,n_classes); img (N,H,W,n_channels).
    """
    n_channels: int = 3
    n_classes: int = 29
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, img, seg, mask, *, train: bool = False):
        dt = self.dtype
        mask = mask[..., None].astype(jnp.float32)  # (N,H,W,1)
        seg_masked = seg * mask
        x = jnp.concatenate([img, seg_masked], axis=-1)
        x = x.astype(dt) if dt is not None else x

        x1 = DoubleConv(64, dt, name="inc")(x, train=train)
        x2 = DoubleConv(128, dt, name="down1")(max_pool_2x2(x1), train=train)
        x3 = DoubleConv(256, dt, name="down2")(max_pool_2x2(x2), train=train)
        x4 = DoubleConv(512, dt, name="down3")(max_pool_2x2(x3), train=train)
        x5 = DoubleConv(512, dt, name="down4")(max_pool_2x2(x4), train=train)

        def up(a, b, feats, name):
            a = upsample2x_bilinear_align(a)
            y = jnp.concatenate([b, a], axis=-1)
            return DoubleConv(feats, dt, name=name)(y, train=train)

        y = up(x5, x4, 256, "up1")
        y = up(y, x3, 128, "up2")
        y = up(y, x2, 64, "up3")
        y = up(y, x1, 64, "up4")
        y = nn.Conv(self.n_classes, (1, 1), dtype=dt, name="outc")(y)
        y = y.astype(jnp.float32)
        return y * (1.0 - mask) + seg_masked


class EncoderDecoder(nn.Module):
    """Dilated-conv encoder-decoder (reference src/models/encoder_decoder.py)."""
    n_channels: int = 15
    n_classes: int = 29
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, seg, *, train: bool = False):
        dt = self.dtype
        x = seg.astype(dt) if dt is not None else seg

        def conv(z, feats, k=3, s=1, d=1):
            p = d * (k // 2)
            return nn.Conv(feats, (k, k), strides=(s, s),
                           padding=((p, p), (p, p)),
                           kernel_dilation=(d, d), dtype=dt)(z)

        x = nn.relu(conv(x, 32, k=5))
        x = nn.relu(conv(x, 64, s=2))
        x = nn.relu(conv(x, 64))
        x = nn.relu(conv(x, 128, s=2))
        x = nn.relu(conv(x, 128))
        x = nn.relu(conv(x, 128))
        for d in (2, 4, 8, 16):
            x = nn.relu(conv(x, 128, d=d))
        x = nn.relu(conv(x, 128))
        x = nn.relu(conv(x, 128))
        x = upsample2x_bilinear_align(x)
        x = nn.relu(conv(x, 128))
        x = nn.relu(conv(x, 128))
        x = upsample2x_bilinear_align(x)
        x = nn.relu(conv(x, 64))
        x = nn.relu(conv(x, 64))
        x = conv(x, self.n_classes)
        return x.astype(jnp.float32)


class Simple(nn.Module):
    """Masked layout completion wrapper (reference src/models/simple.py:11-62).

    forward(mask, seg_gt): embeds class ids with masked pixels set to the
    extra "cropped" id, runs the backbone, composites the prediction into the
    masked region. Loss is computed separately by
    ``losses.ce.weighted_masked_ce`` to keep the module functional.
    """
    n_classes: int = 29
    embedding_dim: Optional[int] = 15
    model_name: str = "u_net"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, mask, seg_gt, img=None, *, train: bool = False
                 ) -> jnp.ndarray:
        seg = jnp.where(mask.astype(bool), self.n_classes,
                        seg_gt.astype(jnp.int32))
        if self.embedding_dim is None:
            x2 = seg[..., None].astype(jnp.float32)
        else:
            x2 = nn.Embed(self.n_classes + 1, self.embedding_dim,
                          dtype=self.dtype, name="embedding")(seg)
        if self.model_name == "u_net":
            # legacy UNet path consumes (img, one-hot seg, known_mask).
            # Polarity: Simple's mask marks the CROPPED region (1 = to
            # complete, reference src/models/simple.py:41) while UNet's
            # composite keeps GT where its mask is 1 (src/u_net.py:114,126)
            # — so UNet receives the complement.
            onehot = seg_one_hot(seg_gt, self.n_classes)
            known = 1.0 - mask.astype(jnp.float32)
            out = UNet(3, self.n_classes, self.dtype, name="layer")(
                img, onehot, known, train=train)
            return out
        elif self.model_name == "encoder_decoder":
            x3 = EncoderDecoder(self.embedding_dim, self.n_classes,
                                self.dtype, name="layer")(x2, train=train)
        else:
            raise ValueError(self.model_name)
        seg_oh = seg_one_hot(seg_gt, self.n_classes)
        maskf = mask[..., None].astype(jnp.float32)
        # composite prediction into the masked (cropped) region
        # (reference src/models/simple.py:53)
        return x3 * maskf + seg_oh


def simple29_unet(embedding_dim: int = 15, **kw) -> Simple:
    return Simple(29, embedding_dim, "u_net", **kw)


def simple29_encoderdecoder(embedding_dim: int = 15, **kw) -> Simple:
    return Simple(29, embedding_dim, "encoder_decoder", **kw)

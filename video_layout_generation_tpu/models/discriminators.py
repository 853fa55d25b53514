"""GAN discriminators.

Capability parity with the reference (src/models/networks.py:546-623):
- NLayerDiscriminator: 70x70 PatchGAN — 4x4 stride-2 conv ladder with
  LeakyReLU(0.2) and norm, stride-1 tail, 1-channel patch logits.
- PixelDiscriminator: 1x1-conv pixel-level real/fake classifier.
NHWC, configurable compute dtype; logits returned in fp32 for stable loss.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from .init import get_initializer
from .norms import get_norm_layer, norm_uses_bias

Dtype = Any


class NLayerDiscriminator(nn.Module):
    input_nc: int = 9
    ndf: int = 64
    n_layers: int = 3
    norm: str = "instance"
    init_type: str = "normal"
    init_gain: float = 0.02
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        dt = self.dtype
        kinit = get_initializer(self.init_type, self.init_gain)
        norm_layer = get_norm_layer(self.norm, dt, train)
        # reference uses bias iff norm != batch (src/models/networks.py:559-562)
        use_bias = norm_uses_bias(self.norm)
        # the conv ladder halves spatial n_layers times then shaves 1px
        # twice; smaller inputs collapse to a zero-size patch map whose
        # mean is NaN — fail loudly instead
        min_hw = 3 * (2 ** self.n_layers)
        if min(x.shape[1], x.shape[2]) < min_hw:
            raise ValueError(
                f"NLayerDiscriminator(n_layers={self.n_layers}) needs "
                f"input >= {min_hw}px; got {x.shape[1]}x{x.shape[2]}")
        x = x.astype(dt) if dt is not None else x

        def c4(z, feats, stride, bias=True):
            return nn.Conv(feats, (4, 4), strides=(stride, stride),
                           padding=((1, 1), (1, 1)), use_bias=bias,
                           dtype=dt, kernel_init=kinit)(z)

        y = nn.leaky_relu(c4(x, self.ndf, 2), 0.2)
        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2 ** n, 8)
            y = c4(y, self.ndf * nf_mult, 2, bias=use_bias)
            y = nn.leaky_relu(norm_layer()(y), 0.2)
        nf_mult = min(2 ** self.n_layers, 8)
        y = c4(y, self.ndf * nf_mult, 1, bias=use_bias)
        y = nn.leaky_relu(norm_layer()(y), 0.2)
        y = c4(y, 1, 1)
        return y.astype(jnp.float32)


class PixelDiscriminator(nn.Module):
    input_nc: int = 9
    ndf: int = 64
    norm: str = "instance"
    init_type: str = "normal"
    init_gain: float = 0.02
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        dt = self.dtype
        kinit = get_initializer(self.init_type, self.init_gain)
        norm_layer = get_norm_layer(self.norm, dt, train)
        use_bias = norm_uses_bias(self.norm)
        x = x.astype(dt) if dt is not None else x

        def c1(z, feats, bias=True):
            return nn.Conv(feats, (1, 1), padding="VALID", use_bias=bias,
                           dtype=dt, kernel_init=kinit)(z)

        y = nn.leaky_relu(c1(x, self.ndf), 0.2)
        y = c1(y, self.ndf * 2, bias=use_bias)
        y = nn.leaky_relu(norm_layer()(y), 0.2)
        y = c1(y, 1, bias=use_bias)
        return y.astype(jnp.float32)

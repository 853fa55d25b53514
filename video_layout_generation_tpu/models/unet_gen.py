"""Recursive U-Net generator (pix2pix flavor).

Capability parity with the reference UnetGenerator/UnetSkipConnectionBlock
(src/models/networks.py:444-543): ``num_downs`` nested skip blocks built from
the innermost out, 4x4 stride-2 convs down (LeakyReLU 0.2) and 4x4 stride-2
transposed convs up (ReLU), skip concat on channels, tanh output. NHWC.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

from .init import get_initializer
from .norms import get_norm_layer, norm_uses_bias

Dtype = Any


class UnetSkipBlock(nn.Module):
    """One skip level: down -> submodule -> up, concat skip unless outermost
    (reference src/models/networks.py:476-543)."""
    outer_nc: int
    inner_nc: int
    input_nc: Optional[int] = None
    submodule: Optional[nn.Module] = None
    outermost: bool = False
    innermost: bool = False
    norm: str = "batch"
    use_dropout: bool = False
    dtype: Optional[Dtype] = None
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        dt = self.dtype
        norm_layer = get_norm_layer(self.norm, dt, train)
        use_bias = norm_uses_bias(self.norm)
        kinit = self.kernel_init
        input_nc = self.input_nc if self.input_nc is not None else self.outer_nc

        def down_conv(z):
            return nn.Conv(self.inner_nc, (4, 4), strides=(2, 2),
                           padding=((1, 1), (1, 1)),
                           use_bias=use_bias or self.outermost, dtype=dt,
                           kernel_init=kinit, name="downconv")(z)

        def up_conv(z, feats, bias):
            return nn.ConvTranspose(feats, (4, 4), strides=(2, 2),
                                    padding="SAME", use_bias=bias, dtype=dt,
                                    kernel_init=kinit, name="upconv")(z)

        if self.outermost:
            y = down_conv(x)
            y = self.submodule(y, train=train)
            y = nn.relu(y)
            y = up_conv(y, self.outer_nc, True)
            return jnp.tanh(y.astype(jnp.float32))
        if self.innermost:
            y = nn.leaky_relu(x, 0.2)
            y = down_conv(y)
            y = nn.relu(y)
            y = up_conv(y, self.outer_nc, use_bias)
            y = norm_layer(name="upnorm")(y)
            return jnp.concatenate([x, y], axis=-1)
        y = nn.leaky_relu(x, 0.2)
        y = down_conv(y)
        y = norm_layer(name="downnorm")(y)
        y = self.submodule(y, train=train)
        y = nn.relu(y)
        y = up_conv(y, self.outer_nc, use_bias)
        y = norm_layer(name="upnorm")(y)
        if self.use_dropout:
            y = nn.Dropout(0.5, deterministic=not train)(y)
        return jnp.concatenate([x, y], axis=-1)


class UnetGenerator(nn.Module):
    """U-Net generator (reference src/models/networks.py:444-473).

    num_downs=8 handles 256x256 (bottleneck 1x1); 7 handles 128x128.
    """
    input_nc: int = 8
    output_nc: int = 3
    num_downs: int = 8
    ngf: int = 64
    norm: str = "batch"
    use_dropout: bool = False
    init_type: str = "normal"
    init_gain: float = 0.02
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        dt = self.dtype
        kinit = get_initializer(self.init_type, self.init_gain)
        x = x.astype(dt) if dt is not None else x
        ngf = self.ngf
        blk = UnetSkipBlock(ngf * 8, ngf * 8, innermost=True, norm=self.norm,
                            dtype=dt, kernel_init=kinit)
        for _ in range(self.num_downs - 5):
            blk = UnetSkipBlock(ngf * 8, ngf * 8, submodule=blk,
                                norm=self.norm, use_dropout=self.use_dropout,
                                dtype=dt, kernel_init=kinit)
        for mult in (4, 2, 1):
            blk = UnetSkipBlock(ngf * mult, ngf * mult * 2, submodule=blk,
                                norm=self.norm, dtype=dt, kernel_init=kinit)
        blk = UnetSkipBlock(self.output_nc, ngf, input_nc=self.input_nc,
                            submodule=blk, outermost=True, norm=self.norm,
                            dtype=dt, kernel_init=kinit)
        return blk(x, train=train)

"""Generator / discriminator factories.

Parity with the reference's ``define_G``/``define_D``
(src/models/networks.py:119-203): string-keyed construction of the pix2pix
nets with norm/init options. Returns (module, params) — flax modules are
immutable, so initialization happens here (the reference's ``init_net``
weight init is folded into the modules' kernel_init).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from .discriminators import NLayerDiscriminator, PixelDiscriminator
from .resnet_gen import ResnetGenerator
from .unet_gen import UnetGenerator


def define_G(input_nc: int, output_nc: int, ngf: int, netG: str,
             norm: str = "batch", use_dropout: bool = False,
             init_type: str = "normal", init_gain: float = 0.02,
             dtype: Optional[Any] = None, seg_out: int = 20,
             rng: Optional[jax.Array] = None,
             sample_hw=(256, 256)) -> Tuple[Any, Any]:
    """Create a generator (module, initialized params)."""
    common = dict(input_nc=input_nc, output_nc=output_nc, ngf=ngf,
                  norm=norm, use_dropout=use_dropout, init_type=init_type,
                  init_gain=init_gain, dtype=dtype)
    if netG == "resnet_9blocks":
        net = ResnetGenerator(n_blocks=9, seg_out=seg_out, **common)
    elif netG == "resnet_6blocks":
        net = ResnetGenerator(n_blocks=6, seg_out=seg_out, **common)
    elif netG == "unet_256":
        net = UnetGenerator(num_downs=8, **common)
    elif netG == "unet_128":
        net = UnetGenerator(num_downs=7, **common)
    else:
        raise NotImplementedError(
            f"Generator model name [{netG}] is not recognized")
    rng = jax.random.key(0) if rng is None else rng
    x = jnp.zeros((1, *sample_hw, input_nc), jnp.float32)
    params = jax.jit(net.init)(rng, x)
    return net, params


def define_D(input_nc: int, ndf: int, netD: str, n_layers_D: int = 3,
             norm: str = "batch", init_type: str = "normal",
             init_gain: float = 0.02, dtype: Optional[Any] = None,
             rng: Optional[jax.Array] = None,
             sample_hw=(256, 256)) -> Tuple[Any, Any]:
    """Create a discriminator (module, initialized params)."""
    common = dict(input_nc=input_nc, ndf=ndf, norm=norm,
                  init_type=init_type, init_gain=init_gain, dtype=dtype)
    if netD == "basic":          # 70x70 PatchGAN
        net = NLayerDiscriminator(n_layers=3, **common)
    elif netD == "n_layers":
        net = NLayerDiscriminator(n_layers=n_layers_D, **common)
    elif netD == "pixel":
        net = PixelDiscriminator(**common)
    else:
        raise NotImplementedError(
            f"Discriminator model name [{netD}] is not recognized")
    rng = jax.random.key(0) if rng is None else rng
    x = jnp.zeros((1, *sample_hw, input_nc), jnp.float32)
    params = jax.jit(net.init)(rng, x)
    return net, params

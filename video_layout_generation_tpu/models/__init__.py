"""Model registry.

Name-based lookup parity with the reference
(``models.__dict__[args.arch]``, reference src/trainer.py:57,82,98 via
src/models/__init__.py) through ``get_model_cls(name)``.
"""

from .blocks import (CoordConv, CoordDownSamplingBlock, CoordLateralBlock,
                     CoordUpSamplingBlock, DownSamplingBlock, LateralBlock,
                     PReLU, UpSamplingBlock)
from .discriminators import NLayerDiscriminator, PixelDiscriminator
from .factories import define_D, define_G
from .fast_gridnet import make_edge_rollout_apply, make_packed_gridnet_apply
from .gridnet import CoordGridNet, GridNet
from .hned import HNED, hned_fused_edge
from .init import get_initializer
from .legacy import (EncoderDecoder, Simple, UNet, simple29_encoderdecoder,
                     simple29_unet)
from .norms import InstanceNorm, get_norm_layer
from .resnet_gen import ResnetBlock, ResnetGenerator
from .unet_gen import UnetGenerator, UnetSkipBlock
from .vae import LayoutCVAE, LayoutVAE, make_cvae_rollout
from .convlstm import ConvLSTMCell, ConvLSTMLayoutPredictor

_REGISTRY = {
    "GridNet": GridNet,
    "CoordGridNet": CoordGridNet,
    "ResnetGenerator": ResnetGenerator,
    "UnetGenerator": UnetGenerator,
    "NLayerDiscriminator": NLayerDiscriminator,
    "PixelDiscriminator": PixelDiscriminator,
    "HNED": HNED,
    "LayoutVAE": LayoutVAE,
    "LayoutCVAE": LayoutCVAE,
    "ConvLSTMLayoutPredictor": ConvLSTMLayoutPredictor,
    "UNet": UNet,
    "EncoderDecoder": EncoderDecoder,
    "simple29_unet": simple29_unet,
    "simple29_encoderdecoder": simple29_encoderdecoder,
}


def get_model_cls(name: str):
    if name not in _REGISTRY:
        raise KeyError(f"unknown model {name!r}; have {sorted(_REGISTRY)}")
    return _REGISTRY[name]


__all__ = list(_REGISTRY) + [
    "define_G", "define_D", "make_packed_gridnet_apply",
    "make_edge_rollout_apply",
    "make_cvae_rollout", "ConvLSTMCell",
    "get_model_cls", "get_initializer", "get_norm_layer", "InstanceNorm",
    "hned_fused_edge", "PReLU", "LateralBlock", "DownSamplingBlock",
    "UpSamplingBlock", "CoordConv", "CoordLateralBlock",
    "CoordDownSamplingBlock", "CoordUpSamplingBlock", "ResnetBlock",
    "UnetSkipBlock", "Simple",
]

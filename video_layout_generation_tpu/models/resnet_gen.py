"""ResNet-based generator with dual seg+img heads.

Capability parity with the reference's modified pix2pix ResnetGenerator
(src/models/networks.py:316-381): reflect-padded 7x7 stem, two stride-2
downsampling convs, N residual blocks, two transposed-conv upsampling stages,
then two 7x7 heads — tanh RGB (3ch) and segmentation logits (20ch). Returns
``(seg, img)`` like the reference forward (src/models/networks.py:375-381).

TPU notes: reflection padding is explicit jnp.pad (fuses fine); transposed
convs lower to MXU-backed grad-of-conv in XLA. NHWC throughout.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .init import get_initializer
from .norms import get_norm_layer, norm_uses_bias

Dtype = Any


def _reflect_pad(x: jnp.ndarray, p: int) -> jnp.ndarray:
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


def _pad2(x, p, padding_type):
    if padding_type == "reflect":
        return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
    if padding_type == "replicate":
        return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="edge")
    if padding_type == "zero":
        return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    raise NotImplementedError(f"padding [{padding_type}] is not implemented")


class ResnetBlock(nn.Module):
    """Residual conv block (reference src/models/networks.py:384-441)."""
    dim: int
    padding_type: str = "reflect"
    norm: str = "instance"
    use_dropout: bool = False
    dtype: Optional[Dtype] = None
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        norm_layer = get_norm_layer(self.norm, self.dtype, train)
        use_bias = norm_uses_bias(self.norm)
        y = _pad2(x, 1, self.padding_type)
        y = nn.Conv(self.dim, (3, 3), padding="VALID", use_bias=use_bias,
                    dtype=self.dtype, kernel_init=self.kernel_init)(y)
        y = nn.relu(norm_layer()(y))
        if self.use_dropout:
            y = nn.Dropout(0.5, deterministic=not train)(y)
        y = _pad2(y, 1, self.padding_type)
        y = nn.Conv(self.dim, (3, 3), padding="VALID", use_bias=use_bias,
                    dtype=self.dtype, kernel_init=self.kernel_init)(y)
        y = norm_layer()(y)
        return x + y


class ResnetGenerator(nn.Module):
    """Dual-head ResNet generator (reference src/models/networks.py:316-381)."""
    input_nc: int = 8
    output_nc: int = 3
    ngf: int = 64
    n_blocks: int = 9
    seg_out: int = 20
    norm: str = "instance"
    use_dropout: bool = False
    padding_type: str = "reflect"
    init_type: str = "normal"
    init_gain: float = 0.02
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        dt = self.dtype
        kinit = get_initializer(self.init_type, self.init_gain)
        norm_layer = get_norm_layer(self.norm, dt, train)
        use_bias = norm_uses_bias(self.norm)
        x = x.astype(dt) if dt is not None else x

        y = _reflect_pad(x, 3)
        y = nn.Conv(self.ngf, (7, 7), padding="VALID", use_bias=use_bias,
                    dtype=dt, kernel_init=kinit)(y)
        y = nn.relu(norm_layer()(y))

        n_down = 2
        for i in range(n_down):
            mult = 2 ** i
            y = nn.Conv(self.ngf * mult * 2, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)), use_bias=use_bias,
                        dtype=dt, kernel_init=kinit)(y)
            y = nn.relu(norm_layer()(y))

        for _ in range(self.n_blocks):
            y = ResnetBlock(self.ngf * (2 ** n_down), self.padding_type,
                            self.norm, self.use_dropout, dt, kinit)(
                                y, train=train)

        for i in range(n_down):
            mult = 2 ** (n_down - i)
            # torch ConvTranspose2d(k=3, s=2, p=1, output_padding=1):
            # the exact flax equivalent is explicit ((1,2),(1,2)) padding
            # (tests/test_convtranspose_parity.py pins this; SAME differs)
            y = nn.ConvTranspose(self.ngf * mult // 2, (3, 3),
                                 strides=(2, 2),
                                 padding=((1, 2), (1, 2)),
                                 use_bias=use_bias, dtype=dt,
                                 kernel_init=kinit)(y)
            y = nn.relu(norm_layer()(y))

        y = _reflect_pad(y, 3)
        img = nn.Conv(self.output_nc, (7, 7), padding="VALID", dtype=dt,
                      kernel_init=kinit, name="last_conv_img")(y)
        img = jnp.tanh(img.astype(jnp.float32))
        seg = nn.Conv(self.seg_out, (7, 7), padding="VALID", dtype=dt,
                      kernel_init=kinit, name="last_conv_seg")(y)
        return seg.astype(jnp.float32), img

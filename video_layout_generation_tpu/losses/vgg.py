"""VGG19 perceptual feature loss.

Parity with the reference VggLoss (src/loss.py:29-49): frozen VGG19 features
truncated at relu4_4, L1 distance in feature space. The reference loads
torchvision's pretrained weights at runtime; here the weights are an external
artifact (.npz produced by tools/convert_torch_weights.py) — with no artifact
the features are He-initialized, which keeps the loss well-defined for
hermetic tests and synthetic training.

TPU design: 12 convs in NHWC (bf16-capable), 2x2 max pools; the L1 reduction
is an fp32 island. Frozen — always called under stop_gradient for the params.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pooling import max_pool_2x2

Dtype = Any

# Conv widths per block up to relu4_4 (VGG19 cfg 'E' truncated).
_BLOCKS = ((64, 64), (128, 128), (256, 256, 256, 256), (512, 512, 512, 512))


class VGG19Features(nn.Module):
    """VGG19 trunk through relu4_4 (torchvision features[:-10] parity)."""
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dt = self.dtype
        x = x.astype(dt) if dt is not None else x
        for b, widths in enumerate(_BLOCKS):
            if b > 0:
                x = max_pool_2x2(x)
            for j, f in enumerate(widths):
                from ..models.blocks import WidthPackedConv3x3
                x = WidthPackedConv3x3(
                    f, dtype=dt, kernel_init=nn.initializers.he_normal(),
                    name=f"conv{b+1}_{j+1}")(x)
                x = nn.relu(x)
        return x


def vgg_feature_loss(model: VGG19Features, params, output: jnp.ndarray,
                     target: jnp.ndarray) -> jnp.ndarray:
    """L1 in relu4_4 feature space; params are frozen."""
    params = jax.lax.stop_gradient(params)
    fo = model.apply(params, output)
    ft = model.apply(params, jax.lax.stop_gradient(target))
    return jnp.mean(jnp.abs(fo.astype(jnp.float32) - ft.astype(jnp.float32)))


def load_vgg_params(path: str) -> dict:
    """Load converted .npz weights into the flax param tree layout.

    The converter stores ``conv{b}_{j}.kernel`` (HWIO) and
    ``conv{b}_{j}.bias`` arrays.
    """
    raw = np.load(path)
    params = {}
    for b, widths in enumerate(_BLOCKS):
        for j, _ in enumerate(widths):
            name = f"conv{b+1}_{j+1}"
            params[name] = {
                "kernel": jnp.asarray(raw[f"{name}.kernel"]),
                "bias": jnp.asarray(raw[f"{name}.bias"]),
            }
    return {"params": params}


def make_vgg_loss(vgg_weights: Optional[str] = None,
                  dtype: Optional[Dtype] = None,
                  image_hw=(256, 256)):
    """Build (model, params) for the perceptual loss.

    Random (He) init when no weight artifact is supplied — documented
    deviation: parity with the reference's *pretrained* loss requires the
    converted torchvision weights.
    """
    model = VGG19Features(dtype=dtype)
    if vgg_weights is not None:
        params = load_vgg_params(vgg_weights)
    else:
        params = model.init(jax.random.key(0),
                            jnp.zeros((1, *image_hw, 3), jnp.float32))
    return model, params

"""HNED — Holistically-Nested Edge Detection (frozen feature extractor).

Capability parity with the reference (src/models/hned.py): a VGG16-style
5-stage trunk, five 1x1 side-score convs, bilinear upsampling of each score
map back to input resolution, and a 1x1 fused combine with sigmoid. Returns
the 6-tuple ``(d1..d5, fuse)``; the training pipeline consumes only ``fuse``
(the reference's channel math, src/trainer.py:197, shows that intent).

Preprocessing parity: caffe-style scaling to [0,255] and BGR mean
subtraction happen inside ``__call__`` (reference src/models/hned.py:74-78).
The original network was trained on BGR-ordered input; the reference feeds
RGB tensors straight in, so channel 0 is treated as blue. We default to the
documented intent (flip RGB->BGR first); set ``assume_bgr_input=True`` to
reproduce the reference's literal behavior.

TPU design: NHWC bf16-capable trunk; the five score-map upsamples are
matmul-form bilinear resizes that XLA fuses. Used under ``stop_gradient``
during training — no params are ever updated.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.pooling import max_pool_2x2
from ..ops.resize import resize_bilinear

Dtype = Any

_CAFFE_MEANS_BGR = (104.00698793, 116.66876762, 122.67891434)


class HNED(nn.Module):
    dtype: Optional[Dtype] = None
    assume_bgr_input: bool = False

    @nn.compact
    def __call__(self, rgb: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        """rgb: (N, H, W, 3) in [0, 1]. Returns 6 edge maps (N, H, W, 1)."""
        h, w = rgb.shape[1], rgb.shape[2]
        dt = self.dtype

        x = rgb.astype(jnp.float32) * 255.0
        if not self.assume_bgr_input:
            x = x[..., ::-1]  # RGB -> BGR
        x = x - jnp.asarray(_CAFFE_MEANS_BGR, dtype=jnp.float32)
        x = x.astype(dt) if dt is not None else x

        def conv(n, feats, k=3):
            if k == 3:
                from .blocks import WidthPackedConv3x3
                return WidthPackedConv3x3(feats, dtype=dt, name=n)
            pad = ((k // 2, k // 2), (k // 2, k // 2)) if k > 1 else "VALID"
            return nn.Conv(feats, (k, k), padding=pad, dtype=dt, name=n)

        def stage(x, name, widths, pool):
            if pool:
                x = max_pool_2x2(x)
            for j, f in enumerate(widths):
                x = nn.relu(conv(f"{name}_{j}", f)(x))
            return x

        v1 = stage(x, "vgg1", (64, 64), pool=False)
        v2 = stage(v1, "vgg2", (128, 128), pool=True)
        v3 = stage(v2, "vgg3", (256, 256, 256), pool=True)
        v4 = stage(v3, "vgg4", (512, 512, 512), pool=True)
        v5 = stage(v4, "vgg5", (512, 512, 512), pool=True)

        scores = []
        for i, v in enumerate((v1, v2, v3, v4, v5)):
            s = conv(f"score{i+1}", 1, k=1)(v).astype(jnp.float32)
            # torch F.interpolate(..., mode='bilinear', align_corners=False)
            scores.append(resize_bilinear(s, (h, w), align_corners=False))

        fuse_in = jnp.concatenate(scores, axis=-1)
        if dt is not None:
            fuse_in = fuse_in.astype(dt)
        fuse = nn.sigmoid(
            conv("combine", 1, k=1)(fuse_in).astype(jnp.float32))
        d = tuple(nn.sigmoid(s) for s in scores)
        return d + (fuse,)


def hned_fused_edge(model: HNED, params, rgb: jnp.ndarray) -> jnp.ndarray:
    """Frozen fused edge map with gradients stopped (N, H, W, 1)."""
    out = model.apply(params, rgb)
    return jax.lax.stop_gradient(out[-1])

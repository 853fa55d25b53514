"""Combined perceptual loss = VGG + SSIM + Gradient.

Parity with the reference CombinedLoss (src/loss.py:54-62). Functional form:
``CombinedLoss`` carries the frozen VGG model+params and is a plain callable
usable inside any jitted step.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Optional

import jax.numpy as jnp

from .pixel import gradient_loss
from .ssim import ssim_loss
from .vgg import VGG19Features, make_vgg_loss, vgg_feature_loss


@dataclass(frozen=True)
class CombinedLoss:
    vgg_model: VGG19Features
    vgg_params: Any
    # Fused Pallas SSIM (ops/pallas/ssim.py): hardware-validated exact, but
    # its custom VJP duplicates an XLA forward — only a win on paths that
    # are never differentiated (validation / metrics).
    ssim_use_pallas: bool = False

    @classmethod
    def create(cls, vgg_weights: Optional[str] = None, dtype=None,
               image_hw=(256, 256)) -> "CombinedLoss":
        model, params = make_vgg_loss(vgg_weights, dtype, image_hw)
        return cls(model, params)

    def eval_variant(self) -> "CombinedLoss":
        """Copy for non-differentiated (eval) use: fused Pallas SSIM."""
        return dataclasses.replace(self, ssim_use_pallas=True)

    def __call__(self, output: jnp.ndarray, target: jnp.ndarray
                 ) -> jnp.ndarray:
        return (vgg_feature_loss(self.vgg_model, self.vgg_params,
                                 output, target)
                + gradient_loss(output, target)
                + ssim_loss(output, target,
                            use_pallas=self.ssim_use_pallas))

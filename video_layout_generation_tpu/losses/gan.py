"""GAN objectives + WGAN-GP gradient penalty.

Parity with the reference GANLoss (src/models/networks.py:209-275) and
``cal_gradient_penalty`` (src/models/networks.py:278-313):
- 'lsgan':   MSE against 1/0 targets
- 'vanilla': BCE-with-logits against 1/0 targets
- 'wgangp':  -mean(pred) for real, +mean(pred) for fake

The gradient penalty uses jax.grad of the summed critic output w.r.t. the
interpolated input — functionally identical to torch.autograd.grad with
ones grad_outputs.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def gan_loss(prediction: jnp.ndarray, target_is_real: bool,
             gan_mode: str = "lsgan", real_label: float = 1.0,
             fake_label: float = 0.0) -> jnp.ndarray:
    pred = prediction.astype(jnp.float32)
    if gan_mode == "lsgan":
        target = real_label if target_is_real else fake_label
        return jnp.mean((pred - target) ** 2)
    if gan_mode == "vanilla":
        target = real_label if target_is_real else fake_label
        # BCEWithLogits: softplus(-x) for target 1, softplus(x) for target 0
        t = jnp.full_like(pred, target)
        return jnp.mean(jnp.maximum(pred, 0) - pred * t
                        + jnp.log1p(jnp.exp(-jnp.abs(pred))))
    if gan_mode == "wgangp":
        return -jnp.mean(pred) if target_is_real else jnp.mean(pred)
    raise NotImplementedError(f"gan mode {gan_mode} not implemented")


def gradient_penalty(critic_fn: Callable[[jnp.ndarray], jnp.ndarray],
                     real: jnp.ndarray, fake: jnp.ndarray,
                     key: jax.Array, interp_type: str = "mixed",
                     constant: float = 1.0,
                     lambda_gp: float = 10.0):
    """WGAN-GP penalty. critic_fn maps (N,H,W,C) -> patch logits.

    Returns (penalty, gradients) like the reference.
    """
    if lambda_gp <= 0.0:
        return jnp.asarray(0.0), None
    real = real.astype(jnp.float32)
    fake = fake.astype(jnp.float32)
    if interp_type == "real":
        x = real
    elif interp_type == "fake":
        x = fake
    elif interp_type == "mixed":
        alpha = jax.random.uniform(key, (real.shape[0], 1, 1, 1))
        x = alpha * real + (1.0 - alpha) * fake
    else:
        raise NotImplementedError(f"{interp_type} not implemented")

    def scalar_out(z):
        return jnp.sum(critic_fn(z).astype(jnp.float32))

    grads = jax.grad(scalar_out)(x)
    flat = grads.reshape(real.shape[0], -1)
    norms = jnp.linalg.norm(flat + 1e-16, axis=1)
    penalty = jnp.mean((norms - constant) ** 2) * lambda_gp
    return penalty, grads

"""Variational objectives for the layout VAE/CVAE family (fp32 islands).

- ``kl_standard_normal``: KL(q(z|x) || N(0,1)) per batch element, meaned.
- ``kl_gaussians``: KL(q || p) for two diagonal Gaussians (CVAE posterior
  vs learned prior).
- ``vae_loss`` / ``cvae_loss``: CE reconstruction + beta * KL, with beta
  supplied by the caller (KL annealing lives in the train loop —
  train/schedules.kl_anneal).
"""

from __future__ import annotations

import jax.numpy as jnp

from .ce import cross_entropy_loss


def kl_standard_normal(mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    mu = mu.astype(jnp.float32)
    logvar = logvar.astype(jnp.float32)
    kl = -0.5 * (1.0 + logvar - mu ** 2 - jnp.exp(logvar))
    return jnp.mean(jnp.sum(kl.reshape(kl.shape[0], -1), axis=1))


def kl_gaussians(mu_q, lv_q, mu_p, lv_p) -> jnp.ndarray:
    mu_q, lv_q, mu_p, lv_p = (t.astype(jnp.float32)
                              for t in (mu_q, lv_q, mu_p, lv_p))
    kl = 0.5 * (lv_p - lv_q
                + (jnp.exp(lv_q) + (mu_q - mu_p) ** 2) / jnp.exp(lv_p)
                - 1.0)
    return jnp.mean(jnp.sum(kl.reshape(kl.shape[0], -1), axis=1))


def vae_loss(logits, target_ids, mu, logvar, beta: float = 1.0):
    recon = cross_entropy_loss(logits, target_ids)
    kl = kl_standard_normal(mu, logvar)
    total = recon + beta * kl
    return total, {"loss": total, "recon": recon, "kl": kl}


def cvae_loss(logits, target_ids, q_stats, p_stats, beta: float = 1.0):
    recon = cross_entropy_loss(logits, target_ids)
    kl = kl_gaussians(*q_stats, *p_stats)
    total = recon + beta * kl
    return total, {"loss": total, "recon": recon, "kl": kl}

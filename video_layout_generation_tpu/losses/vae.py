"""Variational objectives for the layout VAE/CVAE family (fp32 islands).

- ``kl_standard_normal``: KL(q(z|x) || N(0,1)) per batch element, meaned.
- ``kl_gaussians``: KL(q || p) for two diagonal Gaussians (CVAE posterior
  vs learned prior).
- ``vae_loss`` / ``cvae_loss``: CE reconstruction + beta * KL, with beta
  supplied by the caller (KL annealing lives in the train loop —
  train/vae_steps.kl_anneal).

Posterior-collapse remedies (round 3, all opt-in, defaults = the plain
ELBO):

- ``free_bits``: per-dimension KL floor (Kingma et al. 2016, "free bits").
  Dimensions whose batch-mean KL is below the floor contribute the floor
  (a constant — no gradient pushing them further down), so the optimizer
  cannot profit from collapsing individual latent dims to the prior.
- ``capacity``: the Burgess et al. 2018 capacity objective
  ``recon + beta * |KL - C|`` — the KL is steered TOWARD a target C
  (scheduled 0 -> C_max by the train loop) instead of to zero, forcing the
  latent channel to carry ~C nats.
- ``class_weights`` (vae_loss): class-weighted reconstruction CE — the
  unweighted pixel mean gives the ~12% minority-class pixels almost no
  gradient against an ~88%-background canvas (the measured Config-1
  majority-class floor, BENCH_NOTES).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .ce import class_weighted_ce, cross_entropy_loss


def kl_standard_normal(mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    mu = mu.astype(jnp.float32)
    logvar = logvar.astype(jnp.float32)
    kl = -0.5 * (1.0 + logvar - mu ** 2 - jnp.exp(logvar))
    return jnp.mean(jnp.sum(kl.reshape(kl.shape[0], -1), axis=1))


def kl_standard_normal_free_bits(mu, logvar, free_bits: float):
    """Sum over latent dims of max(mean-over-batch per-dim KL, free_bits).

    Returns (kl_used, kl_raw): kl_used feeds the loss, kl_raw (the true
    KL) is reported so collapse remains observable in the metrics."""
    mu = mu.astype(jnp.float32)
    logvar = logvar.astype(jnp.float32)
    kl = -0.5 * (1.0 + logvar - mu ** 2 - jnp.exp(logvar))
    per_dim = jnp.mean(kl.reshape(kl.shape[0], -1), axis=0)  # (D,)
    kl_raw = jnp.sum(per_dim)
    kl_used = jnp.sum(jnp.maximum(per_dim, free_bits))
    return kl_used, kl_raw


def kl_gaussians(mu_q, lv_q, mu_p, lv_p) -> jnp.ndarray:
    mu_q, lv_q, mu_p, lv_p = (t.astype(jnp.float32)
                              for t in (mu_q, lv_q, mu_p, lv_p))
    kl = 0.5 * (lv_p - lv_q
                + (jnp.exp(lv_q) + (mu_q - mu_p) ** 2) / jnp.exp(lv_p)
                - 1.0)
    return jnp.mean(jnp.sum(kl.reshape(kl.shape[0], -1), axis=1))


def vae_loss(logits, target_ids, mu, logvar, beta: float = 1.0,
             free_bits: float = 0.0, capacity=None,
             class_weights: Optional[jnp.ndarray] = None):
    """Plain ELBO by default; ``free_bits`` / ``capacity`` / class-weighted
    recon are the documented collapse remedies (module docstring).
    ``capacity`` (a traced scalar or None) takes precedence over free_bits
    for the KL term shaping; both report the raw KL."""
    if class_weights is not None:
        recon = class_weighted_ce(logits, target_ids, class_weights)
    else:
        recon = cross_entropy_loss(logits, target_ids)
    if free_bits > 0.0:
        kl_used, kl = kl_standard_normal_free_bits(mu, logvar, free_bits)
    else:
        kl = kl_standard_normal(mu, logvar)
        kl_used = kl
    if capacity is not None:
        kl_term = jnp.abs(kl_used - capacity)
    else:
        kl_term = kl_used
    total = recon + beta * kl_term
    return total, {"loss": total, "recon": recon, "kl": kl}


def cvae_loss(logits, target_ids, q_stats, p_stats, beta: float = 1.0):
    recon = cross_entropy_loss(logits, target_ids)
    kl = kl_gaussians(*q_stats, *p_stats)
    total = recon + beta * kl
    return total, {"loss": total, "recon": recon, "kl": kl}

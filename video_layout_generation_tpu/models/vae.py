"""Variational layout models: LayoutVAE and conditional CVAE.

BASELINE.json's benchmark configs call for VAE-family layout generation
(single-frame layout autoencode; KL-annealed CVAE rollout) on top of the
reference's capability surface. These are TPU-first implementations:

- ``LayoutVAE``: conv encoder over one-hot layouts -> diagonal Gaussian
  latent -> conv decoder -> layout logits. Loss = CE reconstruction +
  beta * KL (losses/vae.py), with KL annealing handled by the train loop.
- ``LayoutCVAE``: the conditional variant — the encoder sees (context,
  target), the prior is a learned network over the context alone, and the
  decoder consumes (context, z); autoregressive rollout samples from the
  prior per step (lax.scan, models/fast path not needed — latent nets are
  small).

NHWC, bf16-capable; latents fp32.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class ConvEncoder(nn.Module):
    """Strided conv trunk -> (mu, logvar) maps at 1/8 resolution."""
    latent_dim: int = 32
    widths: Sequence[int] = (32, 64, 128)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        x = x.astype(dt) if dt is not None else x
        for wdt in self.widths:
            x = nn.Conv(wdt, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)), dtype=dt)(x)
            x = nn.relu(x)
        mu = nn.Conv(self.latent_dim, (3, 3), padding=((1, 1), (1, 1)),
                     dtype=dt, name="mu")(x).astype(jnp.float32)
        # start the posterior tight (std ~= exp(-2.5) ~= 0.08): with the
        # default std ~= 1, z is noise-dominated from step 0, the decoder
        # learns to ignore it, and the VAE settles into full posterior
        # collapse (constant majority-class output) regardless of beta —
        # observed on the synthetic layout runs (BENCH_NOTES.md)
        logvar = nn.Conv(self.latent_dim, (3, 3), padding=((1, 1), (1, 1)),
                         dtype=dt, name="logvar",
                         bias_init=nn.initializers.constant(-5.0)
                         )(x).astype(jnp.float32)
        return mu, logvar


class ConvDecoder(nn.Module):
    """Transposed-conv decoder from latent maps to layout logits.

    ``skip``: optional full-resolution conditioning (e.g. the one-hot
    context layouts) concatenated before the head convs — without direct
    pixel-level access to the previous layout, an upsample-only decoder
    produces blurry logits whose argmax collapses to the majority class
    (measured: CVAE generation mIoU 0.06 without the skip vs the
    ConvLSTM family's 0.75 on the same data; BENCH_NOTES.md)."""
    n_classes: int = 20
    widths: Sequence[int] = (128, 64, 32)
    refines: int = 1  # refine convs per upsample stage (depth knob)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, z, skip=None):
        dt = self.dtype
        x = z.astype(dt) if dt is not None else z
        for wdt in self.widths:
            x = nn.ConvTranspose(wdt, (3, 3), strides=(2, 2),
                                 padding="SAME", dtype=dt)(x)
            x = nn.relu(x)
            # refine after each upsample: a bare transposed-conv stack
            # cannot sharpen class boundaries from the 1/8-res latent
            # (measured: VAE reconstruction stuck at the majority class
            # even with an informative posterior; BENCH_NOTES.md)
            for _ in range(self.refines):
                x = nn.Conv(wdt, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=dt)(x)
                x = nn.relu(x)
        if skip is not None:
            s = skip.astype(x.dtype) if dt is not None else skip
            x = jnp.concatenate([x, s], axis=-1)
            x = nn.Conv(self.widths[-1], (3, 3),
                        padding=((1, 1), (1, 1)), dtype=dt)(x)
            x = nn.relu(x)
        x = nn.Conv(self.n_classes, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=dt)(x)
        return x.astype(jnp.float32)


class ConvTrunk(nn.Module):
    """Stride-2 conv feature trunk to 1/8 resolution (full receptive
    coverage of the input — every context pixel reaches the features)."""
    widths: Sequence[int] = (32, 64, 64)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        x = x.astype(dt) if dt is not None else x
        for wdt in self.widths:
            x = nn.Conv(wdt, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)), dtype=dt)(x)
            x = nn.relu(x)
        return x


def reparameterize(rng, mu, logvar):
    std = jnp.exp(0.5 * logvar)
    return mu + std * jax.random.normal(rng, mu.shape, mu.dtype)


class LayoutVAE(nn.Module):
    """Single-frame layout autoencoder (one-hot in, logits out)."""
    n_classes: int = 20
    latent_dim: int = 32
    widths: Sequence[int] = (32, 64, 128)
    dec_refines: int = 1
    dtype: Optional[Dtype] = None

    def setup(self):
        self.encoder = ConvEncoder(self.latent_dim, widths=self.widths,
                                   dtype=self.dtype)
        self.decoder = ConvDecoder(self.n_classes,
                                   widths=tuple(reversed(self.widths)),
                                   refines=self.dec_refines,
                                   dtype=self.dtype)

    def __call__(self, onehot, rng) -> Tuple[jnp.ndarray, jnp.ndarray,
                                             jnp.ndarray]:
        mu, logvar = self.encoder(onehot)
        z = reparameterize(rng, mu, logvar)
        logits = self.decoder(z)
        return logits, mu, logvar

    def decode(self, z):
        return self.decoder(z)


class LayoutCVAE(nn.Module):
    """Conditional VAE over layout sequences.

    __call__(context, target, rng): posterior from (context,target),
    learned prior from context, decode (context, z_posterior).
    ``generate(context, rng)``: sample the prior and decode — the rollout
    step.
    """
    n_classes: int = 20
    latent_dim: int = 32
    context_frames: int = 2
    dtype: Optional[Dtype] = None

    def setup(self):
        self.posterior = ConvEncoder(self.latent_dim, dtype=self.dtype,
                                     name="posterior")
        self.prior = ConvEncoder(self.latent_dim, dtype=self.dtype,
                                 name="prior")
        self.decoder = ConvDecoder(self.n_classes, dtype=self.dtype)
        # full-coverage context trunk. The original single stride-8 conv
        # sampled only a 3x3 window of every 8x8 block, so most context
        # pixels never reached the decoder — generation could not track
        # motion and collapsed to the majority class (BENCH_NOTES.md
        # layout-family convergence).
        self.ctx_proj = ConvTrunk((32, 64, 64), dtype=self.dtype,
                                  name="ctx_proj")

    def _ctx_feat(self, context):
        return self.ctx_proj(context)

    def __call__(self, context, target, rng):
        """context: (N,H,W,C_ctx) one-hot stack; target: (N,H,W,n_classes)."""
        mu_q, lv_q = self.posterior(
            jnp.concatenate([context, target], axis=-1))
        mu_p, lv_p = self.prior(context)
        z = reparameterize(rng, mu_q, lv_q)
        logits = self.decoder(
            jnp.concatenate([z, self._ctx_feat(context)], axis=-1),
            skip=context)
        return logits, (mu_q, lv_q), (mu_p, lv_p)

    def generate(self, context, rng):
        mu_p, lv_p = self.prior(context)
        z = reparameterize(rng, mu_p, lv_p)
        return self.decoder(
            jnp.concatenate([z, self._ctx_feat(context)], axis=-1),
            skip=context)


def make_cvae_rollout(model: LayoutCVAE, n_frames: int = 16,
                      n_classes: int = 20, jit: bool = True):
    """Autoregressive layout rollout: slide a 2-layout one-hot context,
    sample the prior, argmax, feed back (one lax.scan program)."""

    def rollout(variables, seg1, seg2, rng):
        """seg1/seg2: (N,H,W) int ids. Returns (N, n_frames, H, W) ids."""
        oh = lambda s: jax.nn.one_hot(s, n_classes, dtype=jnp.float32)

        def step(carry, key):
            c1, c2 = carry
            ctx = jnp.concatenate([oh(c1), oh(c2)], axis=-1)
            logits = model.apply(variables, ctx, key,
                                 method=LayoutCVAE.generate)
            nxt = jnp.argmax(logits, axis=-1)
            return (c2, nxt), nxt

        keys = jax.random.split(rng, n_frames)
        _, segs = jax.lax.scan(step, (seg1.astype(jnp.int32),
                                      seg2.astype(jnp.int32)), keys)
        return jnp.moveaxis(segs, 0, 1)

    return jax.jit(rollout) if jit else rollout

"""Adversarial training: alternating G/D updates in one compiled step.

Capability parity with the reference's conditional-GAN path — fully written
but commented out there (src/trainer.py:219-246), with the complete flag
surface (src/main.py:147-158). Semantics implemented:

- D update: fake pair ``cat(frame1, frame2, G(x).img)`` with the generated
  frame detached, real pair ``cat(frame1, frame2, frame3)``;
  ``loss_D = 0.5*(GAN(pred_fake, False) + GAN(pred_real, True))``
  (+ WGAN-GP gradient penalty when gan_mode == 'wgangp').
- G update: ``GAN(D(fake_pair), True)`` + the 3-term reconstruction loss
  (w_l1*L1 + w_style*(VGG+SSIM+Grad) + w_seg*CE), evaluated against the
  D parameters *after* the D update (the reference's sequential order).

Both updates live in ONE jitted program — no host round-trip between the
D and G halves; XLA schedules the shared generator forward once.

BatchNorm discriminators (torch pix2pix's ``define_D`` default norm,
src/models/networks.py:131) are supported: running stats live in
``GanTrainState.disc_stats`` and are threaded through the step with the
torch update order (fake forward, then real forward, then the G-side
forward) — all still inside ONE compiled program. The WGAN-GP interpolate
forward does not update stats (deviation: negligible running-stat drift,
DEVIATIONS.md).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp

from ..losses.ce import cross_entropy_loss
from ..losses.gan import gan_loss, gradient_penalty
from ..losses.pixel import l1_loss
from .assemble import normalize_model_output
from .state import TrainState
from .steps import _maybe_flip, decode_batch, prepare_inputs


@flax.struct.dataclass
class GanTrainState:
    gen: TrainState
    disc: TrainState
    disc_stats: Any = None   # BatchNorm running stats (norm='batch' only)

    @property
    def step(self):
        return self.gen.step


def make_gan_train_step(gen_apply: Callable, disc_apply: Callable,
                        hned_apply: Optional[Callable], combined_loss,
                        gan_mode: str = "lsgan", w_l1: float = 40.0,
                        w_style: float = 20.0, w_seg: float = 10.0,
                        lambda_gp: float = 10.0, flip_mode: str = "batch",
                        donate: bool = True,
                        disc_batch_stats: bool = False):
    """Returns jitted ``gan_step(state, hned_params, batch, rng)``.

    ``disc_batch_stats=True`` for BatchNorm discriminators: ``disc_apply``
    is then the Module.apply taking {'params', 'batch_stats'} variables with
    ``train=True, mutable=['batch_stats']``; running-stat updates thread
    through the step in torch's forward order."""

    def run_d(d_params, stats, z):
        """Discriminator forward returning (logits, new_stats)."""
        if not disc_batch_stats:
            return disc_apply(d_params, z), stats
        out, upd = disc_apply({"params": d_params["params"],
                               "batch_stats": stats}, z,
                              train=True, mutable=["batch_stats"])
        return out, jax.lax.stop_gradient(upd["batch_stats"])

    def gan_step(state: GanTrainState, hned_params, batch, rng):
        batch = decode_batch(batch)
        rng_flip, rng_gp = jax.random.split(rng)
        x, f3n = prepare_inputs(hned_apply, hned_params, batch)
        s3 = batch["seg3"]
        # frames (normalized) for the conditional pair; channel positions in
        # x depend on the edge layout, so recompute from the batch directly
        from .assemble import normalize_image
        from .steps import _flip_w
        f1n = normalize_image(batch["img1"])
        f2n = normalize_image(batch["img2"])
        if flip_mode == "batch":
            coin = jax.random.bernoulli(rng_flip)
            x, f3n, s3, f1n, f2n = _maybe_flip(coin, x, f3n, s3, f1n, f2n)
        elif flip_mode == "per_example":
            coins = jax.random.bernoulli(rng_flip, shape=(x.shape[0],))
            sel = lambda t: jnp.where(
                coins.reshape((-1,) + (1,) * (t.ndim - 1)), _flip_w(t), t)
            x, f3n, s3 = sel(x), sel(f3n), sel(s3)
            f1n, f2n = sel(f1n), sel(f2n)
        elif flip_mode != "none":
            raise ValueError(f"unknown flip_mode {flip_mode!r}")

        # ---- shared generator forward -------------------------------
        seg_logits, img = gen_apply(state.gen.params, x)
        img_n = normalize_model_output(img)
        fake_pair_detached = jnp.concatenate(
            [f1n, f2n, jax.lax.stop_gradient(img_n)], axis=-1)
        real_pair = jnp.concatenate([f1n, f2n, f3n], axis=-1)

        # ---- D update -----------------------------------------------
        def d_loss_fn(d_params):
            # torch forward order: fake then real, stats threaded through
            pred_fake, s1 = run_d(d_params, state.disc_stats,
                                  fake_pair_detached)
            pred_real, s2 = run_d(d_params, s1, real_pair)
            loss_fake = gan_loss(pred_fake, False, gan_mode)
            loss_real = gan_loss(pred_real, True, gan_mode)
            loss_d = 0.5 * (loss_fake + loss_real)
            if gan_mode == "wgangp":
                pen, _ = gradient_penalty(
                    lambda z: run_d(d_params, s2, z)[0], real_pair,
                    fake_pair_detached, rng_gp, lambda_gp=lambda_gp)
                loss_d = loss_d + pen
            return loss_d, (loss_fake, loss_real, s2)

        ((loss_d, (loss_d_fake, loss_d_real, stats_d)),
         d_grads) = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.disc.params)
        new_disc = state.disc.apply_gradients(d_grads)

        # ---- G update (against the updated D) -----------------------
        def g_loss_fn(g_params):
            # the G forward through D also updates running stats in train
            # mode (torch semantics), hence the threaded s_g
            seg_logits_g, img_g = gen_apply(g_params, x)
            img_gn = normalize_model_output(img_g)
            fake_pair = jnp.concatenate([f1n, f2n, img_gn], axis=-1)
            pred_fake, s_g = run_d(
                jax.lax.stop_gradient(new_disc.params), stats_d, fake_pair)
            loss_gan = gan_loss(pred_fake, True, gan_mode)
            loss_l1 = l1_loss(img_gn, f3n) * w_l1
            loss_style = combined_loss(img_gn, f3n) * w_style
            loss_seg = cross_entropy_loss(seg_logits_g, s3) * w_seg
            total = loss_gan + loss_l1 + loss_style + loss_seg
            return total, ({"loss_gan": loss_gan, "loss_l1": loss_l1,
                            "loss_style": loss_style, "loss_seg": loss_seg},
                           s_g)

        (loss_g, (g_metrics, stats_g)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.gen.params)
        new_gen = state.gen.apply_gradients(g_grads)

        metrics = dict(g_metrics)
        metrics.update({"loss": loss_g, "loss_d": loss_d,
                        "loss_d_fake": loss_d_fake,
                        "loss_d_real": loss_d_real})
        return GanTrainState(gen=new_gen, disc=new_disc,
                             disc_stats=stats_g), metrics

    return jax.jit(gan_step, donate_argnums=(0,) if donate else ())

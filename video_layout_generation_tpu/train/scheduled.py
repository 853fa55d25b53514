"""Scheduled sampling for single-step training (rollout-fidelity lever).

The reference trains strictly teacher-forced (src/trainer.py:175-258) and
its autoregressive rollout (src/trainer.py:459-469) therefore sees its own
imperfect predictions only at inference — the classic exposure-bias gap,
measured here as per-step rollout fidelity decaying 0.75 -> 0.09 over 8
steps. Scheduled sampling (Bengio et al., 2015) closes the gap at ~1/4 the
cost of K=4 BPTT: per example, with probability ``p``, the newest input
frame/layout pair is replaced by the model's OWN (detached) prediction from
the previous window, and the ordinary single-step loss applies.

Data contract: the stacked window batch with T >= 4 frames (the
``multistep`` window pipeline with an extra frame). Per batch:

  teacher (no grad): (f0, s0, f1, s1) -> (f2_hat, s2_hat)
  mix:   f2* = where(bernoulli(p), f2_hat, f2);  s2* likewise
  student (trained): (f1, s1, f2*, s2*) -> predict (f3, s3)

Cost: 2 forwards + 1 backward vs K forwards + K backwards for K-step BPTT.
``p`` is a traced scalar — the Trainer ramps it across epochs without
recompiling. p=0 reduces to the teacher-forced objective on the window's
last triplet.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .assemble import (assemble_model_input, denormalize_image,
                       normalize_image, normalize_model_output)
from .multistep import decode_window_batch
from .state import TrainState
from .steps import make_loss_fn


def make_scheduled_train_step(model_apply: Callable,
                              hned_apply: Optional[Callable], combined_loss,
                              w_l1: float = 40.0, w_style: float = 20.0,
                              w_seg: float = 10.0, donate: bool = True,
                              jit: bool = True):
    """Returns jitted ``train_step(state, hned_params, batch, rng, p)``
    over the T>=4 window contract. ``p`` in [0, 1] is the probability that
    an example's newest input pair is the model's own prediction."""
    use_edges = hned_apply is not None
    loss_fn = make_loss_fn(model_apply, combined_loss, w_l1, w_style, w_seg)

    def edge_of_norm(hned_params, frame_n):
        return jax.lax.stop_gradient(
            hned_apply(hned_params, denormalize_image(frame_n))[-1])

    def train_step(state: TrainState, hned_params, batch, rng, p):
        imgs, segs = decode_window_batch(batch)
        if imgs.shape[1] < 4:
            raise ValueError("scheduled sampling needs >= 4-frame windows, "
                             f"got {imgs.shape[1]}")
        f0, f1, f2, f3 = (imgs[:, i] for i in range(-4, 0))
        s0, s1, s2, s3 = (segs[:, i] for i in range(-4, 0))
        f0n, f1n, f2n, f3n = (normalize_image(f) for f in (f0, f1, f2, f3))
        s0c = s0.astype(jnp.float32)[..., None]
        s1c = s1.astype(jnp.float32)[..., None]
        s2c = s2.astype(jnp.float32)[..., None]
        edges = {}
        if use_edges:
            for i, f in ((0, f0), (1, f1), (2, f2)):
                edges[i] = jax.lax.stop_gradient(
                    hned_apply(hned_params, f)[-1])

        # teacher pass (detached): predict frame 2 from (0, 1)
        x_t = assemble_model_input(
            s0c, f0n, f1n, s1c,
            edges.get(0), edges.get(1)) if use_edges else \
            assemble_model_input(s0c, f0n, f1n, s1c)
        t_logits, t_img = model_apply(state.params, x_t)
        f2_hat = jax.lax.stop_gradient(normalize_model_output(t_img))
        s2_hat = jax.lax.stop_gradient(
            jnp.argmax(t_logits, axis=-1)).astype(jnp.float32)[..., None]

        # per-example mix: with prob p feed the model its own prediction
        rng_mask, rng_flip = jax.random.split(rng)
        m = jax.random.bernoulli(rng_mask, p, (f2n.shape[0], 1, 1, 1))
        f2_star = jnp.where(m, f2_hat, f2n)
        s2_star = jnp.where(m, s2_hat, s2c)
        e2_star = edge_of_norm(hned_params, f2_star) if use_edges else None
        # (recomputing e2* keeps edge inputs consistent with the mixed
        # frame — matching the inference rollout's in-loop edge recompute)

        x = assemble_model_input(s1c, f1n, f2_star, s2_star,
                                 edges.get(1), e2_star) if use_edges else \
            assemble_model_input(s1c, f1n, f2_star, s2_star)

        # whole-batch flip (reference src/trainer.py:200), applied AFTER
        # edge extraction like steps.py/multistep.py
        coin = jax.random.bernoulli(rng_flip)
        x, f3n_t, s3_t = jax.lax.cond(
            coin,
            lambda t: (jnp.flip(t[0], axis=-2), jnp.flip(t[1], axis=-2),
                       jnp.flip(t[2], axis=-1)),
            lambda t: t, (x, f3n, s3))

        (_, (metrics, _, _)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, x, f3n_t, s3_t)
        metrics = dict(metrics, ss_p=p)
        return state.apply_gradients(grads), metrics

    if not jit:
        return train_step
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def scheduled_p(epoch: int, p_final: float, ramp_epochs: int) -> float:
    """Linear ramp 0 -> p_final over ``ramp_epochs`` (0 = constant)."""
    if ramp_epochs <= 0:
        return p_final
    return p_final * min(1.0, (epoch + 1) / ramp_epochs)

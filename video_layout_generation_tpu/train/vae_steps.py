"""Jitted train steps for the variational / recurrent layout families
(BASELINE.json configs 1-3): LayoutVAE autoencode, ConvLSTM next-layout
prediction, and KL-annealed CVAE sequence modeling.

beta (the KL weight) is a traced scalar argument so annealing needs no
recompilation; ``kl_anneal`` provides the standard linear warmup.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..losses.ce import cross_entropy_loss
from ..losses.vae import cvae_loss, vae_loss
from .state import TrainState


def kl_anneal(step: int, warmup_steps: int = 1000,
              beta_max: float = 1.0, cycle_steps: int = 0) -> float:
    """Linear KL warmup: 0 -> beta_max over warmup_steps.

    ``cycle_steps > 0`` switches to CYCLICAL annealing (Fu et al. 2019):
    each cycle ramps 0 -> beta_max over its first half then holds —
    periodically re-opening the latent channel so a collapsed posterior
    gets fresh low-beta epochs to become informative again."""
    if cycle_steps > 0:
        phase = (step % cycle_steps) / cycle_steps
        return beta_max * min(1.0, 2.0 * phase)
    return beta_max * min(1.0, step / max(warmup_steps, 1))


def capacity_schedule(step: int, c_max: float,
                      c_steps: int = 1000) -> float:
    """Linear KL capacity target 0 -> c_max nats over c_steps (Burgess et
    al. 2018); feed as ``capacity`` to the VAE step."""
    return c_max * min(1.0, step / max(c_steps, 1))


def make_vae_train_step(model, n_classes: int = 20, donate: bool = True,
                        free_bits: float = 0.0, use_capacity: bool = False,
                        class_weights=None):
    """step(state, seg_ids (N,H,W), rng, beta[, capacity]) ->
    (state, metrics). Collapse remedies (losses/vae.py docstring) are
    static step-construction options; beta and the capacity target are
    traced scalars (no recompile across the schedule)."""
    if class_weights is not None:
        class_weights = jnp.asarray(class_weights, jnp.float32)

    def step_fn(state: TrainState, seg_ids, rng, beta, capacity=None):
        onehot = jax.nn.one_hot(seg_ids.astype(jnp.int32), n_classes)

        def loss_fn(params):
            logits, mu, logvar = model.apply(params, onehot, rng)
            return vae_loss(logits, seg_ids, mu, logvar, beta,
                            free_bits=free_bits, capacity=capacity,
                            class_weights=class_weights)

        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads), metrics

    if not use_capacity:
        base = step_fn
        step_fn = lambda state, seg_ids, rng, beta: base(
            state, seg_ids, rng, beta)
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_cvae_train_step(model, n_classes: int = 20, donate: bool = True):
    """step(state, ctx_ids (N,T,H,W), target_ids (N,H,W), rng, beta)."""

    def step_fn(state: TrainState, ctx_ids, target_ids, rng, beta):
        t = ctx_ids.shape[1]
        oh = jax.nn.one_hot(ctx_ids.astype(jnp.int32), n_classes)
        # (N,T,H,W,C) -> channel-stacked context (N,H,W,T*C)
        ctx = jnp.concatenate([oh[:, i] for i in range(t)], axis=-1)
        target_oh = jax.nn.one_hot(target_ids.astype(jnp.int32), n_classes)

        def loss_fn(params):
            logits, q_stats, p_stats = model.apply(params, ctx, target_oh,
                                                   rng)
            return cvae_loss(logits, target_ids, q_stats, p_stats, beta)

        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads), metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_convlstm_train_step(model, n_classes: int = 20,
                             donate: bool = True):
    """step(state, ctx_ids (N,T,H,W), target_ids (N,H,W))."""

    def step_fn(state: TrainState, ctx_ids, target_ids):
        ctx_oh = jax.nn.one_hot(ctx_ids.astype(jnp.int32), n_classes)

        def loss_fn(params):
            logits = model.apply(params, ctx_oh)
            loss = cross_entropy_loss(logits, target_ids)
            return loss, {"loss": loss}

        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads), metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

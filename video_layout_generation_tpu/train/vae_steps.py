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


def make_cvae_multistep_train_step(model, n_classes: int = 20, k: int = 2,
                                   donate: bool = True,
                                   layout_noise: float = 0.0,
                                   feedback: str = "prior"):
    """K-step exposure training for the CVAE — the anti-drift lever set
    proven on the flagship (train/multistep.py) ported to the layout
    family (VERDICT r4 #5). ``step(state, seg_ids (N,T,H,W) with
    T >= k+2, rng, beta) -> (state, metrics)``.

    Step i trains the full CVAE objective (posterior/prior KL + recon)
    against target frame i+2, but for i > 0 the newest CONTEXT frame is
    the model's own fed-back argmax prediction instead of ground truth —
    sampled from the PRIOR by default, i.e. exactly the distribution the
    ``make_cvae_rollout`` scan feeds itself (feedback='posterior' uses the
    training-path decode instead: cheaper, milder exposure). Layout
    feedback is argmax ids, so no gradient flows through the feedback —
    this is exposure-bias training (context drawn from the model's own
    rollout distribution), not BPTT.

    ``layout_noise`` > 0 additionally corrupts each fed-back layout pixel
    to a uniform random class with that probability (same semantics as
    multistep.py's layout channel lever).

    ``k=1`` runs the identical ops on the identical rng as
    ``make_cvae_train_step`` (bit-identity, tested)."""
    if feedback not in ("prior", "posterior"):
        raise ValueError(f"unknown feedback {feedback!r}")

    def one_hot_ctx(c1, c2):
        oh = lambda s: jax.nn.one_hot(s, n_classes)
        return jnp.concatenate([oh(c1), oh(c2)], axis=-1)

    def step_fn(state: TrainState, seg_ids, rng, beta):
        seg_ids = seg_ids.astype(jnp.int32)

        def loss_fn(params):
            c1, c2 = seg_ids[:, 0], seg_ids[:, 1]
            totals = []
            metric_sum = None
            for i in range(k):
                target = seg_ids[:, i + 2]
                target_oh = jax.nn.one_hot(target, n_classes)
                ctx = one_hot_ctx(c1, c2)
                # step 0 consumes rng exactly like the single-step path
                key = rng if i == 0 else jax.random.fold_in(rng, i)
                logits, q_stats, p_stats = model.apply(params, ctx,
                                                       target_oh, key)
                total, metrics = cvae_loss(logits, target, q_stats,
                                           p_stats, beta)
                totals.append(total)
                metric_sum = (metrics if metric_sum is None else
                              {mk: metric_sum[mk] + metrics[mk]
                               for mk in metrics})
                if i + 1 < k:
                    if feedback == "prior":
                        gen_key = jax.random.fold_in(key, 1 << 16)
                        from ..models.vae import LayoutCVAE
                        gen_logits = model.apply(params, ctx, gen_key,
                                                 method=LayoutCVAE.generate)
                    else:
                        gen_logits = logits
                    nxt = jax.lax.stop_gradient(
                        jnp.argmax(gen_logits, axis=-1))
                    if layout_noise > 0.0:
                        k_mask = jax.random.fold_in(key, (1 << 16) + 1)
                        k_cls = jax.random.fold_in(key, (1 << 16) + 2)
                        corrupt = jax.random.bernoulli(
                            k_mask, layout_noise, nxt.shape)
                        rand_cls = jax.random.randint(
                            k_cls, nxt.shape, 0, n_classes)
                        nxt = jnp.where(corrupt, rand_cls, nxt)
                    c1, c2 = c2, nxt
            # plain mean over steps keeps the loss scale (and the
            # Adam-calibrated lr of the warm-start recipe) unchanged
            inv_k = 1.0 / k
            loss = sum(totals) * inv_k
            metrics = {mk: v * inv_k for mk, v in metric_sum.items()}
            metrics["loss"] = loss
            return loss, metrics

        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads), metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_convlstm_multistep_train_step(model, n_classes: int = 20,
                                       k: int = 2, donate: bool = True,
                                       layout_noise: float = 0.0):
    """The same K-step exposure objective for the deterministic ConvLSTM
    predictor: ``step(state, seg_ids (N,T,H,W), ...)`` — steps i > 0 see
    the model's own argmax prediction as the newest context frame.
    ``k=1`` is bit-identical to ``make_convlstm_train_step`` given the
    first-triplet slice of the window."""

    def step_fn(state: TrainState, seg_ids, rng):
        seg_ids = seg_ids.astype(jnp.int32)

        def loss_fn(params):
            c1, c2 = seg_ids[:, 0], seg_ids[:, 1]
            total = 0.0
            for i in range(k):
                target = seg_ids[:, i + 2]
                ctx_oh = jax.nn.one_hot(jnp.stack([c1, c2], axis=1),
                                        n_classes)
                logits = model.apply(params, ctx_oh)
                total = total + cross_entropy_loss(logits, target)
                if i + 1 < k:
                    nxt = jax.lax.stop_gradient(
                        jnp.argmax(logits, axis=-1))
                    if layout_noise > 0.0:
                        key = jax.random.fold_in(rng, i)
                        corrupt = jax.random.bernoulli(
                            jax.random.fold_in(key, 1), layout_noise,
                            nxt.shape)
                        rand_cls = jax.random.randint(
                            jax.random.fold_in(key, 2), nxt.shape, 0,
                            n_classes)
                        nxt = jnp.where(corrupt, rand_cls, nxt)
                    c1, c2 = c2, nxt
            loss = total / k
            return loss, {"loss": loss}

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

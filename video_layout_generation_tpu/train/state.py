"""Train state + optimizer construction.

Optimizer family parity with the reference (src/main.py:137-145,
src/trainer.py:83): adam/adamax with (beta1, 0.999), sgd with step decay
every ``lr_decay_step`` epochs by ``lr_decay_gamma`` (the reference's
``set_epoch`` scheduler intent, src/trainer.py:163-164, fixing defect §2c#8).

The learning rate is injected as a mutable hyperparameter so the host loop
can set it per epoch without recompiling the step.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray           # global step counter (int32)
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation) -> "TrainState":
        return cls(params=params, opt_state=tx.init(params),
                   step=jnp.zeros((), jnp.int32), tx=tx)

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(params=optax.apply_updates(self.params, updates),
                            opt_state=new_opt, step=self.step + 1)


def make_optimizer(optimizer: str = "adam", lr: float = 2e-4,
                   beta1: float = 0.5,
                   moment_dtype=None) -> optax.GradientTransformation:
    """``moment_dtype`` (e.g. jnp.bfloat16) stores Adam's FIRST moment in
    reduced precision (optax mu_dtype) — halves the m-buffer HBM traffic in
    the update. The second moment stays fp32 (optax does not expose its
    dtype, and v's long-horizon accumulation is the precision-sensitive
    half). Opt-in; default is exact fp32."""
    if optimizer == "adam":
        base = lambda learning_rate: optax.adam(learning_rate, b1=beta1,
                                                b2=0.999,
                                                mu_dtype=moment_dtype)
    elif optimizer == "adamax":
        base = lambda learning_rate: optax.adamax(learning_rate, b1=beta1,
                                                  b2=0.999)
    elif optimizer == "sgd":
        base = lambda learning_rate: optax.sgd(learning_rate)
    else:
        raise ValueError(f"unknown optimizer {optimizer!r}")
    return optax.inject_hyperparams(base)(learning_rate=lr)


def current_lr(state: TrainState) -> float:
    return float(state.opt_state.hyperparams["learning_rate"])


def set_lr(state: TrainState, lr: float) -> TrainState:
    hp = dict(state.opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state.replace(opt_state=state.opt_state._replace(hyperparams=hp))


def epoch_decayed_lr(base_lr: float, epoch: int, decay_step: int,
                     decay_gamma: float) -> float:
    """Staircase decay: lr * gamma^(epoch // step)."""
    return base_lr * (decay_gamma ** (epoch // max(decay_step, 1)))

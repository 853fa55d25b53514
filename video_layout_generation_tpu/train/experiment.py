"""Multi-network experiment base.

Capability parity with the reference's pix2pix ``BaseModel`` ABC
(src/models/base_model.py): a reusable harness for experiments that manage
several named networks — per-net LR schedulers, eval/test wrappers, ordered
visuals/losses dicts for display, per-net save/load
(``<epoch>_net_<name>`` naming parity), and selective freezing (the
functional analogue of ``set_requires_grad``: gradients of frozen nets are
zeroed via an optax mask).

The flagship Trainer (train/trainer.py) doesn't need this generality; it
exists for users porting BaseModel-style experiment subclasses.
"""

from __future__ import annotations

import abc
import os
from collections import OrderedDict
from typing import Any, Dict

import jax
import orbax.checkpoint as ocp

from .schedules import PlateauScheduler, get_schedule
from .state import TrainState, current_lr, set_lr


class ExperimentBase(abc.ABC):
    """Manage named (module, TrainState) pairs with schedulers and I/O."""

    def __init__(self, save_dir: str, lr_policy: str = "linear",
                 is_train: bool = True, **policy_kw):
        self.save_dir = save_dir
        self.is_train = is_train
        self.lr_policy = lr_policy
        self.policy_kw = policy_kw
        self.nets: "OrderedDict[str, Any]" = OrderedDict()       # modules
        self.states: "OrderedDict[str, TrainState]" = OrderedDict()
        self.frozen: set = set()
        self.loss_names: list = []
        self.visual_names: list = []
        self.metric = 0.0            # plateau policy input
        self._plateaus: Dict[str, PlateauScheduler] = {}
        os.makedirs(save_dir, exist_ok=True)

    # -- network registry ----------------------------------------------
    def register(self, name: str, module, state: TrainState):
        self.nets[name] = module
        self.states[name] = state
        # snapshot the base LR now — schedules must scale from the
        # registration-time rate, not a later (already-decayed) one
        if not hasattr(self, "_base_lrs"):
            self._base_lrs = {}
        self._base_lrs[name] = current_lr(state)
        if self.lr_policy == "plateau":
            self._plateaus[name] = PlateauScheduler(current_lr(state))

    # -- abstract experiment hooks --------------------------------------
    @abc.abstractmethod
    def set_input(self, batch):
        ...

    @abc.abstractmethod
    def forward(self):
        ...

    @abc.abstractmethod
    def optimize_parameters(self):
        ...

    # -- schedulers ------------------------------------------------------
    def update_learning_rate(self, epoch: int):
        """Per-epoch LR update across all registered nets
        (BaseModel.update_learning_rate parity)."""
        for name, st in self.states.items():
            if self.lr_policy == "plateau":
                lr = self._plateaus[name].update(self.metric)
            else:
                sched = get_schedule(self.lr_policy)
                lr = sched(self._base_lrs[name], epoch, **self.policy_kw)
            self.states[name] = set_lr(st, lr)
        return {n: current_lr(s) for n, s in self.states.items()}

    # -- freezing (set_requires_grad parity) -----------------------------
    def set_requires_grad(self, names, requires_grad: bool):
        names = [names] if isinstance(names, str) else names
        for n in names:
            (self.frozen.discard if requires_grad else self.frozen.add)(n)

    def mask_frozen(self, name: str, grads):
        """Zero gradients of a frozen net (functional freeze)."""
        if name in self.frozen:
            return jax.tree_util.tree_map(lambda g: g * 0, grads)
        return grads

    # -- eval / test -----------------------------------------------------
    def eval(self):
        self.is_train = False

    def test(self, batch):
        self.set_input(batch)
        out = self.forward()
        self.compute_visuals()
        return out

    def compute_visuals(self):
        pass

    def get_current_visuals(self) -> "OrderedDict[str, Any]":
        return OrderedDict((n, getattr(self, n))
                           for n in self.visual_names if hasattr(self, n))

    def get_current_losses(self) -> "OrderedDict[str, float]":
        return OrderedDict((n, float(getattr(self, "loss_" + n)))
                           for n in self.loss_names
                           if hasattr(self, "loss_" + n))

    # -- per-net save/load (BaseModel naming parity) ----------------------
    def _net_path(self, epoch, name) -> str:
        return os.path.join(self.save_dir, f"{epoch}_net_{name}")

    def save_networks(self, epoch):
        ckptr = ocp.PyTreeCheckpointer()
        for name, st in self.states.items():
            ckptr.save(self._net_path(epoch, name),
                       {"params": st.params}, force=True)

    def load_networks(self, epoch):
        ckptr = ocp.PyTreeCheckpointer()
        for name in self.nets:
            tree = ckptr.restore(self._net_path(epoch, name))
            self.states[name] = self.states[name].replace(
                params=tree["params"])

    def print_networks(self, verbose: bool = False):
        print("---------- Networks initialized -------------")
        for name, st in self.states.items():
            n_params = sum(x.size
                           for x in jax.tree_util.tree_leaves(st.params))
            if verbose:
                print(self.nets[name])
            print("[Network %s] Total number of parameters : %.3f M"
                  % (name, n_params / 1e6))
        print("-----------------------------------------------")

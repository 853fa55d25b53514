"""Checkpoint save/restore (Orbax).

One schema replaces the reference's mismatched save/load pair
(src/trainer.py:390-414, defects §2c#3-4): a single pytree
``{"params", "opt_state", "epoch", "step", "arch"}`` saved per epoch under
``<dir>/<epoch:03d>`` with a ``latest`` alias (the reference's
``%03d.pth`` + ``latest.pth`` contract, src/trainer.py:400-402).

Both reference load modes are honored:
- ``--ckpt``  -> ``restore_weights`` (params only, warm start),
- ``--resume``-> ``restore`` (epoch + params + optimizer, arch-checked).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


def reshape_like(template: Any, restored: Any) -> Any:
    """Rebuild ``restored`` (orbax's dict/list representation) onto the
    pytree structure of ``template``.

    ``PyTreeCheckpointer.restore`` without an item template returns
    namedtuples as field-name dicts and tuples as lists, which breaks
    optax states (e.g. ``InjectStatefulHyperparamsState``) on resume.
    Walking the live template restores the exact container types.
    """
    if template is None:
        return None
    # namedtuple (optax states): restored is a dict keyed by field name
    if isinstance(template, tuple) and hasattr(template, "_fields"):
        return type(template)(**{
            f: reshape_like(getattr(template, f), restored[f])
            for f in template._fields})
    if isinstance(template, (tuple, list)):
        if len(template) != len(restored):
            raise ValueError(
                f"checkpoint structure mismatch: {len(restored)} entries "
                f"for a {len(template)}-element {type(template).__name__}")
        return type(template)(
            reshape_like(t, r) for t, r in zip(template, restored))
    if isinstance(template, dict):
        return {k: reshape_like(v, restored[k]) for k, v in template.items()}
    return restored  # leaf


def merge_params(live: Any, restored: Any):
    """Key-gated partial warm start (the reference's ``--ckpt`` semantics,
    src/trainer.py:65-76: ``{k: v for k, v in ckpt if k in model_dict}`` then
    ``model_dict.update(...)``): take the restored value for every leaf path
    present in BOTH trees with a matching shape, keep the live initializer
    everywhere else.

    This is what makes cross-architecture warm starts work — e.g. seeding a
    CoordGridNet from a GridNet checkpoint loads every shared block and
    freshly initializes the coord-specific ones, instead of crashing on the
    wholesale replace.

    Returns ``(merged, report)`` where report is a dict of sorted path lists:
    ``loaded`` (intersection, shape-matched), ``missing`` (live-only, kept at
    init), ``unexpected`` (checkpoint-only, dropped), ``shape_mismatch``
    (both, incompatible shapes — kept at init, like torch strict=False).
    """
    import numpy as np

    def _flatten(tree, prefix=()):
        out = {}
        if isinstance(tree, dict):
            for k, v in tree.items():
                out.update(_flatten(v, prefix + (str(k),)))
        else:
            out[prefix] = tree
        return out

    flat_live = _flatten(live)
    flat_restored = _flatten(restored)
    loaded, mismatched = [], []
    merged_flat = {}
    for path, leaf in flat_live.items():
        if path in flat_restored:
            r = flat_restored[path]
            if tuple(np.shape(r)) == tuple(np.shape(leaf)):
                merged_flat[path] = r
                loaded.append("/".join(path))
                continue
            mismatched.append(
                f"{'/'.join(path)} (ckpt {tuple(np.shape(r))} vs "
                f"live {tuple(np.shape(leaf))})")
        merged_flat[path] = leaf

    def _unflatten(flat):
        tree: dict = {}
        for path, leaf in flat.items():
            node = tree
            for k in path[:-1]:
                node = node.setdefault(k, {})
            node[path[-1]] = leaf
        return tree

    report = {
        "loaded": sorted(loaded),
        "missing": sorted("/".join(p) for p in flat_live
                          if p not in flat_restored),
        "unexpected": sorted("/".join(p) for p in flat_restored
                             if p not in flat_live),
        "shape_mismatch": sorted(mismatched),
    }
    return _unflatten(merged_flat), report


class CheckpointManager:
    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.PyTreeCheckpointer()

    def _path(self, tag) -> str:
        if isinstance(tag, int):
            tag = f"{tag:03d}"
        return os.path.join(self.directory, str(tag))

    def save(self, epoch: int, params: Any, opt_state: Any, step: int,
             arch: str, extra: Optional[dict] = None):
        tree = {"params": params, "opt_state": opt_state,
                "epoch": epoch, "step": int(step), "arch": arch}
        if extra:
            tree.update(extra)
        path = self._path(epoch)
        self._ckptr.save(path, tree, force=True)
        # 'latest' alias: a symlink (cheap), falling back to a re-save
        latest = self._path("latest")
        try:
            if os.path.islink(latest):
                os.unlink(latest)
            elif os.path.exists(latest):
                import shutil
                shutil.rmtree(latest)
            os.symlink(path, latest)
        except OSError:
            self._ckptr.save(latest, tree, force=True)

    def restore(self, tag, arch: Optional[str] = None) -> dict:
        tree = self._ckptr.restore(self._path(tag))
        if arch is not None and tree.get("arch") != arch:
            raise ValueError(
                f"Architecture mismatch: ckpt {tree.get('arch')}, "
                f"config {arch}")
        # weights-only snapshots (tools/persist_artifacts.py) store a
        # self-describing string sentinel in opt_state — fail a full
        # resume early instead of a confusing reshape_like TypeError
        if isinstance(tree.get("opt_state"), str):
            raise ValueError(
                f"cannot fully resume from {self._path(tag)}: "
                f"{tree['opt_state']}")
        return tree

    def restore_weights(self, tag) -> Any:
        """Warm-start params only (the reference's --ckpt path)."""
        return self._ckptr.restore(self._path(tag))["params"]

    @staticmethod
    def restore_path(path: str, arch: Optional[str] = None) -> dict:
        """Restore from an absolute checkpoint path (file-or-dir tag)."""
        tree = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
        if arch is not None and tree.get("arch") != arch:
            raise ValueError(
                f"Architecture mismatch: ckpt {tree.get('arch')}, "
                f"config {arch}")
        return tree

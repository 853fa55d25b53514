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

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

"""Persist / restore expensive trained artifacts across round boundaries.

The campaign prerequisites (the flagship 96-epoch base checkpoint and the
pretrained HNED/VGG loss nets) live in gitignored ``artifacts/`` and /tmp,
both of which are wiped between rounds — every round has re-spent ~2-3 h
of TPU time rebuilding them (see BENCH_NOTES round 4).  This tool packs
them into compressed ``.npz`` snapshots under the COMMITTED
``artifacts_store/`` directory and unpacks them back into the layouts the
tools expect:

  # after building: snapshot into git-tracked store
  python tools/persist_artifacts.py pack \
      --ckpt artifacts/flagship/checkpoint/096 \
      --out artifacts_store/flagship_096.npz
  python tools/persist_artifacts.py pack \
      --npz artifacts/hned_synth.npz --out artifacts_store/hned_synth.npz

  # at round start: restore the expected layout
  python tools/persist_artifacts.py unpack \
      --snap artifacts_store/flagship_096.npz \
      --ckpt artifacts/flagship/checkpoint/096
  python tools/persist_artifacts.py unpack \
      --snap artifacts_store/hned_synth.npz --npz artifacts/hned_synth.npz

Checkpoint snapshots keep params only (flattened "/"-joined keys plus
``__epoch__``/``__step__``/``__arch__`` meta): they serve the weights-only
warm-start path (``--ckpt``, io/checkpoint.restore_path + merge_params).
Unpacked checkpoints carry ``opt_state = 0`` — resuming optimizer state
from a snapshot is deliberately unsupported (the proven objective-switch
recipe is weights-only anyway; BENCH_NOTES "Multi-step BPTT finetune").
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import argparse
import os

import numpy as np

# Snapshots restore with opt_state set to this string sentinel: a full
# --resume against a restored dir then fails loudly in reshape_like (dict
# vs str) with a self-describing value instead of silently loading a zero
# optimizer state. Weights-only warm starts (--ckpt) never read it.
OPT_STATE_SENTINEL = (
    "weights-only snapshot (tools/persist_artifacts.py): optimizer state "
    "was not persisted — warm-start with --ckpt, not --resume")


def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (str(k),)))
    else:
        out[prefix] = tree
    return out


def _unflatten(flat):
    tree: dict = {}
    for path, leaf in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf
    return tree


def _enc_key(key: str, arr: np.ndarray) -> str:
    """Extended dtypes (ml_dtypes bfloat16 etc., numpy kind 'V') survive
    the npz byte round-trip but lose their dtype identity — tag it in the
    key so unpack can view the raw bytes back."""
    return f"{key}::{arr.dtype.name}" if arr.dtype.kind == "V" else key


def _dec(key: str, arr: np.ndarray):
    if "::" not in key:
        return key, arr
    key, name = key.rsplit("::", 1)
    import ml_dtypes  # noqa: F401  (registers the dtype names)
    return key, arr.view(np.dtype(name))


def pack(args):
    if args.npz:
        # byte-exact compressed copy: keys and stored dtypes pass through
        data = dict(np.load(args.npz, allow_pickle=False))
        np.savez_compressed(args.out, **data)
    else:
        from video_layout_generation_tpu.io.checkpoint import \
            CheckpointManager
        tree = CheckpointManager.restore_path(args.ckpt)
        flat = {}
        for p, v in _flatten(tree["params"]).items():
            v = np.asarray(v)
            flat[_enc_key("/".join(p), v)] = v
        flat["__epoch__"] = np.asarray(int(tree.get("epoch", 0)))
        flat["__step__"] = np.asarray(int(tree.get("step", 0)))
        flat["__arch__"] = np.asarray(str(tree.get("arch", "")))
        np.savez_compressed(args.out, **flat)
    mb = os.path.getsize(args.out) / 1e6
    print(f"packed {args.npz or args.ckpt} -> {args.out} ({mb:.1f} MB)")


def unpack(args):
    snap = np.load(args.snap, allow_pickle=False)
    if args.npz:
        os.makedirs(os.path.dirname(os.path.abspath(args.npz)),
                    exist_ok=True)
        np.savez(args.npz, **dict(snap))
        print(f"unpacked {args.snap} -> {args.npz}")
        return
    meta = {"epoch": int(snap["__epoch__"]), "step": int(snap["__step__"]),
            "arch": str(snap["__arch__"])}
    flat = {}
    for k in snap.files:
        if k.startswith("__"):
            continue
        key, arr = _dec(k, snap[k])
        flat[tuple(key.split("/"))] = arr
    params = _unflatten(flat)
    import orbax.checkpoint as ocp
    tree = {"params": params, "opt_state": OPT_STATE_SENTINEL, **meta}
    path = os.path.abspath(args.ckpt)
    ocp.PyTreeCheckpointer().save(path, tree, force=True)
    # 'latest' alias beside the epoch dir so `--resume latest` at least
    # resolves; the resume then fails loudly on the opt_state sentinel
    # instead of a confusing orbax not-found error (ADVICE r4).
    parent = os.path.dirname(path)
    latest = os.path.join(parent, "latest")
    if not os.path.exists(latest) and not os.path.islink(latest):
        try:
            os.symlink(path, latest)
        except OSError:
            pass
    print(f"unpacked {args.snap} -> {path} "
          f"(epoch {meta['epoch']}, arch {meta['arch']!r}, weights-only)")


def main(argv=None):
    # Host-side tool: never touch the tunneled TPU (the session env pins
    # JAX_PLATFORMS=axon; a device restore through the tunnel can block
    # for minutes and would race whatever job holds the TPU lock). Pinned
    # here, not at import time, so importing this module has no global
    # side effect (ADVICE r4).
    import jax
    jax.config.update("jax_platforms", "cpu")
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="mode", required=True)
    pp = sub.add_parser("pack")
    pp.add_argument("--ckpt", help="orbax checkpoint dir to snapshot")
    pp.add_argument("--npz", help="plain npz artifact to snapshot")
    pp.add_argument("--out", required=True)
    up = sub.add_parser("unpack")
    up.add_argument("--snap", required=True)
    up.add_argument("--ckpt", help="orbax checkpoint dir to write")
    up.add_argument("--npz", help="plain npz path to write")
    args = p.parse_args(argv)
    if (args.ckpt is None) == (args.npz is None):
        p.error("exactly one of --ckpt / --npz is required")
    (pack if args.mode == "pack" else unpack)(args)


if __name__ == "__main__":
    main()

"""Convert torch pretrained weights into the framework's .npz artifacts.

The reference loads torchvision's VGG19 (src/loss.py:33) and an external HED
checkpoint (src/trainer.py:97-99) at runtime. The rebuild treats pretrained
weights as explicit artifacts; this one-off converter produces them:

  python tools/convert_torch_weights.py vgg19 --out vgg19_relu44.npz \
      [--torch-state-dict path.pth]
  python tools/convert_torch_weights.py hned --torch-state-dict hed.pth \
      --out hned.npz [--state-dict-key generator]

Layout of the .npz: ``<name>.kernel`` (HWIO fp32) + ``<name>.bias`` per conv,
with names matching the flax modules (losses/vgg.py, models/hned.py).
torch OIHW kernels are transposed to HWIO. With no --torch-state-dict for
vgg19, torchvision's cached/pretrained weights are used if downloadable
(offline environments must pass an explicit state dict).
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse

import numpy as np


def _to_hwio(w) -> np.ndarray:
    # torch conv weight OIHW -> flax HWIO
    return np.ascontiguousarray(np.transpose(np.asarray(w, np.float32),
                                             (2, 3, 1, 0)))


def convert_vgg19(state_dict=None):
    """Map torchvision vgg19.features[:27] convs -> conv{b}_{j} names."""
    if state_dict is None:
        import torchvision
        model = torchvision.models.vgg19(pretrained=True)
        state_dict = model.state_dict()
    # torchvision conv indices in `features` up to relu4_4
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25]
    names = [f"conv{b+1}_{j+1}"
             for b, n in enumerate((2, 2, 4, 4)) for j in range(n)]
    out = {}
    for idx, name in zip(conv_idx, names):
        out[f"{name}.kernel"] = _to_hwio(state_dict[f"features.{idx}.weight"])
        out[f"{name}.bias"] = np.asarray(state_dict[f"features.{idx}.bias"],
                                         np.float32)
    return out


# torch module names in the HED implementation -> our flax conv names
_HNED_NAME_MAP = {}
for _stage, (_tname, _n) in enumerate(
        (("VggOne", 2), ("VggTwo", 2), ("VggThr", 3), ("VggFou", 3),
         ("VggFiv", 3))):
    # conv layers sit at even indices of each Sequential, after optional pool
    _offset = 0 if _stage == 0 else 1
    for _j in range(_n):
        _HNED_NAME_MAP[f"module{_tname}.{_offset + 2*_j}"] = \
            f"vgg{_stage+1}_{_j}"
for _i, _tname in enumerate(("One", "Two", "Thr", "Fou", "Fiv")):
    _HNED_NAME_MAP[f"moduleScore{_tname}"] = f"score{_i+1}"
_HNED_NAME_MAP["moduleCombine.0"] = "combine"


def convert_hned(state_dict):
    out = {}
    for tname, fname in _HNED_NAME_MAP.items():
        out[f"{fname}.kernel"] = _to_hwio(state_dict[f"{tname}.weight"])
        out[f"{fname}.bias"] = np.asarray(state_dict[f"{tname}.bias"],
                                          np.float32)
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("which", choices=["vgg19", "hned"])
    p.add_argument("--torch-state-dict", type=str, default=None)
    p.add_argument("--state-dict-key", type=str, default=None,
                   help="sub-key inside the .pth (e.g. 'generator')")
    p.add_argument("--out", type=str, required=True)
    args = p.parse_args(argv)

    sd = None
    if args.torch_state_dict:
        # dependency-free torch checkpoint reader (zip + legacy formats) —
        # works without torch/torchvision installed
        from video_layout_generation_tpu.io.torch_reader import (
            read_torch_state_dict)
        sd = read_torch_state_dict(args.torch_state_dict,
                                   key=args.state_dict_key)

    if args.which == "vgg19":
        out = convert_vgg19(sd)
    else:
        if sd is None:
            raise SystemExit("hned conversion requires --torch-state-dict")
        out = convert_hned(sd)
    np.savez(args.out, **out)
    print(f"wrote {args.out} ({len(out)} arrays)")


if __name__ == "__main__":
    main()

"""Pretrained-weight artifact loading (.npz produced by
tools/convert_torch_weights.py).

The reference loads torchvision VGG19 and an external HED checkpoint at
runtime (src/loss.py:33, src/trainer.py:97-99). Here pretrained weights are
explicit artifacts: flat .npz files of HWIO kernels + biases keyed by module
path. Loading reshapes them into flax param trees.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_HNED_CONVS = (
    [f"vgg{b+1}_{j}" for b, ws in enumerate(((64, 64), (128, 128),
                                             (256,) * 3, (512,) * 3,
                                             (512,) * 3))
     for j in range(len(ws))]
    + [f"score{i}" for i in range(1, 6)] + ["combine"])


def load_hned_params(path: str) -> dict:
    raw = np.load(path)
    params = {}
    for name in _HNED_CONVS:
        params[name] = {"kernel": jnp.asarray(raw[f"{name}.kernel"]),
                        "bias": jnp.asarray(raw[f"{name}.bias"])}
    return {"params": params}

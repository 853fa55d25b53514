"""Dependency-free torch checkpoint reader: both serialization formats must
roundtrip exactly against torch.save/torch.load, including non-contiguous
tensors, nested containers, and wrapped state dicts; hostile pickles must be
blocked. End-to-end: a torch-saved HED checkpoint read by the pure reader,
converted, and loaded into flax must match the torch forward."""

import io
import pickle
import sys
import os

import numpy as np
import pytest
import torch

from video_layout_generation_tpu.io.torch_reader import (
    read_torch_checkpoint, read_torch_state_dict)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from convert_torch_weights import convert_hned  # noqa: E402
from test_weight_convert import (_fake_hned_state_dict,  # noqa: E402
                                 _torch_hned_forward)


def _sample_state_dict():
    g = torch.Generator().manual_seed(0)
    sd = {
        "conv.weight": torch.randn(8, 3, 3, 3, generator=g),
        "conv.bias": torch.randn(8, generator=g),
        "transposed": torch.randn(4, 6, generator=g).t(),  # non-contiguous
        "scalar": torch.tensor(3.5),
        "ids": torch.arange(10, dtype=torch.int64),
        "half": torch.randn(5, generator=g).half(),
        "flag": torch.tensor(True),
    }
    return sd


@pytest.mark.parametrize("zip_format", [True, False])
def test_roundtrip_matches_torch_load(tmp_path, zip_format):
    sd = _sample_state_dict()
    path = str(tmp_path / f"sd_{zip_format}.pth")
    torch.save(sd, path, _use_new_zipfile_serialization=zip_format)
    ours = read_torch_state_dict(path)
    ref = torch.load(path, map_location="cpu", weights_only=False)
    assert set(ours) == set(ref)
    for k in ref:
        np.testing.assert_array_equal(ours[k], ref[k].numpy(), err_msg=k)
        assert ours[k].dtype == ref[k].numpy().dtype, k


@pytest.mark.parametrize("zip_format", [True, False])
def test_wrapped_state_dict_key(tmp_path, zip_format):
    sd = {"generator": _sample_state_dict(), "epoch": 7}
    path = str(tmp_path / f"wrap_{zip_format}.pth")
    torch.save(sd, path, _use_new_zipfile_serialization=zip_format)
    ours = read_torch_state_dict(path, key="generator")
    assert "conv.weight" in ours
    full = read_torch_checkpoint(path)
    assert full["epoch"] == 7


def test_shared_storage_views(tmp_path):
    base = torch.arange(12, dtype=torch.float32)
    sd = {"full": base, "view": base[3:9], "mat": base.reshape(3, 4)}
    path = str(tmp_path / "views.pth")
    torch.save(sd, path)
    ours = read_torch_state_dict(path)
    ref = torch.load(path, weights_only=False)
    for k in ref:
        np.testing.assert_array_equal(ours[k], ref[k].numpy(), err_msg=k)


def test_hostile_pickle_is_blocked(tmp_path):
    class Evil:
        def __reduce__(self):
            return (os.system, ("true",))

    path = str(tmp_path / "evil.pth")
    torch.save({"x": torch.zeros(1), "payload": Evil()}, path)
    with pytest.raises(pickle.UnpicklingError, match="blocked"):
        read_torch_checkpoint(path)


def test_end_to_end_hned_pth_to_flax_parity(tmp_path):
    """The full artifact path the reference implies (src/trainer.py:97-99):
    a torch .pth HED checkpoint -> pure reader -> converter -> flax HNED,
    numerically matching the torch recomputation."""
    import jax.numpy as jnp

    from video_layout_generation_tpu.io.weights import load_hned_params
    from video_layout_generation_tpu.models import HNED

    sd = _fake_hned_state_dict(seed=5)
    path = str(tmp_path / "hed.pth")
    torch.save({"generator": sd}, path)

    raw = read_torch_state_dict(path, key="generator")
    npz = convert_hned(raw)
    npz_path = tmp_path / "hned.npz"
    np.savez(npz_path, **npz)
    params = load_hned_params(str(npz_path))

    rgb = np.random.default_rng(9).random((1, 32, 32, 3)).astype(np.float32)
    ours = HNED().apply(params, jnp.asarray(rgb))
    with torch.no_grad():
        ref = _torch_hned_forward(sd, rgb)
    np.testing.assert_allclose(np.asarray(ours[-1]), ref[-1], atol=5e-4)

"""Pretraining scripts produce loadable weight artifacts.

The reference depends on external pretrained VGG19/HED checkpoints
(src/loss.py:33, src/trainer.py:97-99). tools/pretrain_{hned,vgg}.py
produce the capability-equivalent artifacts in-environment; these tests run
them at toy scale and assert the exported npz round-trips through the same
loaders the Trainer uses (io/weights.load_hned_params,
losses/vgg.load_vgg_params) and drives a forward pass."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from video_layout_generation_tpu.io.weights import load_hned_params
from video_layout_generation_tpu.losses.vgg import (VGG19Features,
                                                    load_vgg_params)
from video_layout_generation_tpu.models import HNED


def test_pretrain_hned_artifact_roundtrip(tmp_path):
    import pretrain_hned
    out = str(tmp_path / "hned.npz")
    pretrain_hned.main(["--steps", "2", "--bs", "2", "--size", "64",
                        "--out", out])
    params = load_hned_params(out)
    outs = HNED().apply(params, jnp.zeros((1, 64, 64, 3)))
    assert len(outs) == 6
    for o in outs:
        assert o.shape == (1, 64, 64, 1)
        assert bool(jnp.all((o >= 0) & (o <= 1)))


def test_pretrain_vgg_artifact_roundtrip(tmp_path):
    import pretrain_vgg
    out = str(tmp_path / "vgg.npz")
    pretrain_vgg.main(["--steps", "2", "--bs", "2", "--size", "64",
                       "--out", out])
    params = load_vgg_params(out)
    feats = VGG19Features().apply(params, jnp.zeros((1, 64, 64, 3)))
    assert feats.shape == (1, 8, 8, 512)
    # the artifact must differ from the loss's default He init (i.e. the
    # pretraining actually moved the trunk)
    he = VGG19Features().init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    k_art = np.asarray(params["params"]["conv1_1"]["kernel"])
    k_he = np.asarray(he["params"]["conv1_1"]["kernel"])
    assert not np.allclose(k_art, k_he)

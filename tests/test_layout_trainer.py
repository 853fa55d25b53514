"""LayoutTrainer end-to-end over the three layout families (tiny)."""

import numpy as np
import pytest

from video_layout_generation_tpu.config import Config
from video_layout_generation_tpu.train.layout_trainer import LayoutTrainer


@pytest.mark.parametrize("family", ["vae", "cvae", "convlstm"])
def test_layout_trainer_families(family, tmp_path):
    cfg = Config(dataset="synthetic", synthetic_train_size=8,
                 synthetic_val_size=4, image_size=(16, 16), n_classes=8,
                 batch_size=4, epochs=1, compute_dtype="float32",
                 workers=1, path=str(tmp_path), mesh_shape=(1,),
                 rollout_frames=2, lr=1e-3)
    t = LayoutTrainer(cfg, family=family, latent_dim=8, hidden=8,
                      kl_warmup_steps=10)
    m = t.fit()
    assert 0.0 <= m["miou"] <= 1.0
    assert 0.0 <= m["pixel_acc"] <= 1.0
    assert t.global_step == 2


def test_layout_trainer_resume(tmp_path):
    """Resume restores epoch/step/params and fit() runs only the
    remaining epochs (parity with Trainer resume semantics)."""
    import jax

    cfg = Config(dataset="synthetic", synthetic_train_size=8,
                 synthetic_val_size=4, image_size=(16, 16), n_classes=8,
                 batch_size=4, epochs=2, compute_dtype="float32",
                 workers=1, path=str(tmp_path), mesh_shape=(1,),
                 rollout_frames=2, lr=1e-3)
    t = LayoutTrainer(cfg, family="convlstm", hidden=8)
    t.fit()
    assert t.epoch == 2 and t.global_step == 4

    t2 = LayoutTrainer(cfg.replace(epochs=3, resume="latest"),
                       family="convlstm", hidden=8)
    assert t2.epoch == 2 and t2.global_step == 4
    for a, b in zip(jax.tree_util.tree_leaves(t.state.params),
                    jax.tree_util.tree_leaves(t2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    t2.fit()
    assert t2.epoch == 3 and t2.global_step == 6


def test_layout_rollout_fidelity_families():
    """evaluate_layout_rollout scores cvae (prior-sample scan) and convlstm
    (argmax feedback) rollouts against GT futures with per-step metrics."""
    import numpy as np

    from video_layout_generation_tpu.data.synthetic import SyntheticTriplets
    from video_layout_generation_tpu.evaluation import evaluate_layout_rollout

    ds = SyntheticTriplets(size=4, image_hw=(16, 16), seed=3)
    for family in ("cvae", "convlstm"):
        cfg = Config(dataset="synthetic", synthetic_train_size=4,
                     synthetic_val_size=4, image_size=(16, 16), batch_size=4,
                     epochs=1, compute_dtype="float32", workers=1,
                     path=None, mesh_shape=(1,))
        t = LayoutTrainer(cfg, family=family, latent_dim=8, hidden=8)
        fid = evaluate_layout_rollout(t, ds, range(4), n_frames=3)
        assert fid["per_step_miou"].shape == (3,)
        assert np.all(fid["per_step_miou"] >= 0)
        assert np.all(fid["per_step_pixel_acc"] <= 1)

    cfg = Config(dataset="synthetic", synthetic_train_size=4,
                 synthetic_val_size=4, image_size=(16, 16), batch_size=4,
                 epochs=1, compute_dtype="float32", workers=1,
                 path=None, mesh_shape=(1,))
    t = LayoutTrainer(cfg, family="vae", latent_dim=8)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        evaluate_layout_rollout(t, ds, range(4), n_frames=3)

"""Performance-option exactness gates (VERDICT r2 #3a levers).

bf16 Adam first moment (train/state.make_optimizer(moment_dtype=...)):
verify the moment is actually stored reduced, the update stays close to
the fp32 reference after several steps, and the Trainer plumbing
(Config.adam_mu_dtype) trains end to end.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_layout_generation_tpu.train.state import (TrainState,
                                                     make_optimizer)


def _tree_close(a, b, rtol):
    for x, y in zip(jax.tree_util.tree_leaves(a),
                    jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(x, np.float32),
                                   np.asarray(y, np.float32), rtol=rtol,
                                   atol=1e-5)


def test_mu_bf16_stored_reduced_and_close_to_fp32():
    params = {"w": jnp.linspace(-1.0, 1.0, 64).reshape(8, 8),
              "b": jnp.ones((8,)) * 0.3}
    s32 = TrainState.create(params, make_optimizer("adam", 1e-3, 0.9))
    s16 = TrainState.create(params, make_optimizer("adam", 1e-3, 0.9,
                                                   moment_dtype=jnp.bfloat16))
    rng = np.random.default_rng(0)
    for i in range(5):
        g = {"w": jnp.asarray(rng.normal(size=(8, 8)), jnp.float32),
             "b": jnp.asarray(rng.normal(size=(8,)), jnp.float32)}
        s32 = s32.apply_gradients(g)
        s16 = s16.apply_gradients(g)
    # the first moment is genuinely stored in bf16
    mu16 = jax.tree_util.tree_leaves(s16.opt_state)
    assert any(getattr(l, "dtype", None) == jnp.bfloat16 for l in mu16)
    assert not any(getattr(l, "dtype", None) == jnp.bfloat16
                   for l in jax.tree_util.tree_leaves(s32.opt_state))
    # bf16 m-buffer rounding perturbs the update at ~1e-2 relative worst
    # case (8-bit mantissa), far below the gradient-noise scale
    _tree_close(s16.params, s32.params, rtol=2e-2)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(s16.params))


def test_trainer_adam_mu_dtype_e2e(tmp_path):
    from video_layout_generation_tpu.config import Config
    from video_layout_generation_tpu.train import Trainer
    cfg = Config(dataset="synthetic", synthetic_train_size=8,
                 synthetic_val_size=4, image_size=(32, 32), batch_size=4,
                 epochs=1, edge=False, filters_level=(4, 6, 8),
                 compute_dtype="float32", workers=1, mesh_shape=(1,),
                 path=str(tmp_path), rollout_frames=2,
                 adam_mu_dtype="bfloat16")
    t = Trainer(cfg)
    m = t.fit()
    assert np.isfinite(m["loss"])
    assert any(getattr(l, "dtype", None) == jnp.bfloat16
               for l in jax.tree_util.tree_leaves(t.state.opt_state))

"""ExperimentBase harness + define_G/define_D factories (reference
BaseModel / networks factory parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_layout_generation_tpu.models import define_D, define_G
from video_layout_generation_tpu.train.experiment import ExperimentBase
from video_layout_generation_tpu.train.state import (TrainState, current_lr,
                                                     make_optimizer)


def test_define_g_variants():
    for name, hw in (("resnet_6blocks", 32), ("unet_128", 128)):
        net, params = define_G(8, 3, 4, name, norm="instance",
                               sample_hw=(hw, hw))
        assert params["params"]
    with pytest.raises(NotImplementedError):
        define_G(8, 3, 4, "nope", sample_hw=(32, 32))


def test_define_d_variants():
    for name in ("basic", "n_layers", "pixel"):
        net, params = define_D(9, 4, name, n_layers_D=2, norm="instance",
                               sample_hw=(32, 32))
        assert params["params"]
    with pytest.raises(NotImplementedError):
        define_D(9, 4, "nope", sample_hw=(32, 32))


class _Toy(ExperimentBase):
    def set_input(self, batch):
        self.x = batch

    def forward(self):
        return self.x

    def optimize_parameters(self):
        pass


def test_experiment_base_lifecycle(tmp_path):
    exp = _Toy(str(tmp_path), lr_policy="step", decay_iters=2, gamma=0.1)
    params = {"w": jnp.ones((3,))}
    st = TrainState.create(params, make_optimizer("adam", lr=0.1))
    exp.register("G", object(), st)
    exp.register("D", object(), TrainState.create(
        params, make_optimizer("adam", lr=0.1)))

    # freezing zeroes grads
    exp.set_requires_grad("D", False)
    g = exp.mask_frozen("D", {"w": jnp.ones((3,))})
    np.testing.assert_array_equal(np.asarray(g["w"]), 0)
    g = exp.mask_frozen("G", {"w": jnp.ones((3,))})
    np.testing.assert_array_equal(np.asarray(g["w"]), 1)

    # per-epoch LR policy across all nets
    lrs = exp.update_learning_rate(epoch=2)
    assert abs(lrs["G"] - 0.01) < 1e-9

    # per-net save/load with <epoch>_net_<name> naming
    exp.states["G"] = exp.states["G"].replace(
        params={"w": jnp.full((3,), 7.0)})
    exp.save_networks(5)
    exp.states["G"] = exp.states["G"].replace(params={"w": jnp.zeros((3,))})
    exp.load_networks(5)
    np.testing.assert_array_equal(np.asarray(exp.states["G"].params["w"]),
                                  np.full((3,), 7.0))

    # losses/visuals dicts
    exp.loss_names = ["g"]
    exp.loss_g = 1.5
    assert exp.get_current_losses() == {"g": 1.5}

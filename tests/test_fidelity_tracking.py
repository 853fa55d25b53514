"""In-training rollout-fidelity tracking (beyond reference).

``rollout_fidelity_every=N`` logs the held-out per-step rollout mIoU curve
every N epochs during fit() — the north-star fidelity-vs-epoch trajectory
(the reference only dumps rollout frames, src/trainer.py:459-476).
"""

import logging

import numpy as np

from video_layout_generation_tpu.config import Config
from video_layout_generation_tpu.train.trainer import Trainer


class _Capture(logging.Handler):
    def __init__(self):
        super().__init__()
        self.messages = []

    def emit(self, record):
        self.messages.append(record.getMessage())


def _cfg(path, **kw):
    return Config(
        dataset="synthetic", synthetic_train_size=8, synthetic_val_size=4,
        image_size=(32, 32), batch_size=4, epochs=1, edge=False,
        filters_level=(4, 6, 8), compute_dtype="float32",
        workers=2, print_freq=1, path=path, mesh_shape=(1,),
        rollout_frames=2, **kw)


def test_eval_rollout_fidelity_shape_and_range(tmp_path):
    t = Trainer(_cfg(str(tmp_path / "exp"), rollout_fidelity_scenes=2))
    fid = t.eval_rollout_fidelity()
    assert fid["per_step_miou"].shape == (2,)
    assert fid["per_step_pixel_acc"].shape == (2,)
    assert np.all(fid["per_step_miou"] >= 0.0)
    assert np.all(fid["per_step_miou"] <= 1.0)
    assert np.isclose(fid["mean_miou"], fid["per_step_miou"].mean())


def test_fit_logs_fidelity_curve(tmp_path):
    t = Trainer(_cfg(str(tmp_path / "exp"), rollout_fidelity_every=1,
                     rollout_fidelity_scenes=2))
    cap = _Capture()
    t.logger.addHandler(cap)
    try:
        t.fit()
    finally:
        t.logger.removeHandler(cap)
    assert any("Rollout fidelity mean" in m for m in cap.messages)


def test_fidelity_skips_non_sequence_dataset(tmp_path):
    # cityscapes-format datasets have no sequence() contract: the tracker
    # must skip with a log line, not crash fit()
    t = Trainer(_cfg(str(tmp_path / "exp")))
    t.cfg = t.cfg.replace(dataset="cityscapes")
    cap = _Capture()
    t.logger.addHandler(cap)
    try:
        assert t.eval_rollout_fidelity() is None
    finally:
        t.logger.removeHandler(cap)
    assert any("skipping" in m for m in cap.messages)

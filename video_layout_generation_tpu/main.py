"""Training/eval CLI — the reference ``main.py`` surface rebuilt TPU-native.

Same flag names (src/main.py:86-158) via the config shim; same three modes
(src/main.py:64-82): single-pair rollout, validate-only, or the epoch loop.
One process drives the whole device mesh — the reference's per-GPU
``mp.spawn`` + NCCL rendezvous (src/main.py:53-54,183-185) collapses into
``jax.distributed.initialize`` (multi-host only) + mesh construction inside
the Trainer; there is no port/rank plumbing to manage.

Usage:
  python -m video_layout_generation_tpu.main --train_dir ... --val_dir ...
  python -m video_layout_generation_tpu.main --dataset synthetic -e 2
  python -m video_layout_generation_tpu.main --img1 a.png --img2 b.png \
      --seg1 c.png --seg2 d.png --ckpt <ckpt>
"""

from __future__ import annotations

import os
import pathlib

import jax

from .config import Config, config_from_args, default_exp_path
from .io.logging import get_logger
from .parallel.mesh import maybe_initialize_distributed


def run(cfg: Config) -> None:
    maybe_initialize_distributed()
    if cfg.path is None:
        cfg = cfg.replace(path=default_exp_path())
    pathlib.Path(cfg.path).mkdir(parents=True, exist_ok=True)
    pathlib.Path(cfg.path, "checkpoint").mkdir(parents=True, exist_ok=True)

    logger = get_logger(os.path.join(cfg.path, "experiment.log"))
    logger.info("Start of experiment")
    logger.info("=========== Initialized logger =============")
    logger.info("\n\t" + "\n\t".join(
        "%s: %s" % (k, v) for k, v in sorted(vars(cfg).items())))
    logger.info("Devices: %d (%s)" % (
        jax.device_count(), jax.devices()[0].platform))

    from .train.trainer import Trainer
    trainer = Trainer(cfg)

    if all(v is not None for v in (cfg.img1, cfg.img2, cfg.seg1, cfg.seg2)):
        trainer.eval_generate_sequence(cfg.img1, cfg.img2, cfg.seg1,
                                       cfg.seg2)
        return

    if cfg.validate:
        trainer.validate()
        return

    trainer.fit()


def main(argv=None) -> None:
    run(config_from_args(argv))


if __name__ == "__main__":
    main()

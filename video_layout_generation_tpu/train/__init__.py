from .assemble import (IMAGENET_MEAN, IMAGENET_STD, OUT_MEAN, OUT_STD,
                       assemble_model_input, denormalize_image,
                       normalize_image, normalize_model_output)
from .state import TrainState, make_optimizer, current_lr, set_lr
from .steps import make_train_step, make_eval_step
from .rollout import make_rollout_fn
from .multistep import make_multistep_train_step
from .trainer import Trainer
from .experiment import ExperimentBase
from .gan import GanTrainState, make_gan_train_step
from .layout_trainer import LayoutTrainer

__all__ = [
    "IMAGENET_MEAN", "IMAGENET_STD", "OUT_MEAN", "OUT_STD",
    "assemble_model_input", "normalize_image", "denormalize_image",
    "normalize_model_output", "TrainState", "make_optimizer", "current_lr",
    "set_lr", "make_train_step", "make_eval_step", "make_rollout_fn",
    "make_multistep_train_step",
    "Trainer", "ExperimentBase", "GanTrainState", "make_gan_train_step",
    "LayoutTrainer",
]

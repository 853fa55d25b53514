from .metrics import (confusion_matrix, iou_from_confusion, pixel_accuracy,
                      summarize_confusion)
from .export import save_colorized_png, save_npy_stack
from .sequence import (evaluate_layout_rollout,
                       evaluate_trainer_rollout, rollout_fidelity)

__all__ = ["confusion_matrix", "iou_from_confusion", "pixel_accuracy",
           "summarize_confusion",
           "save_colorized_png", "save_npy_stack", "rollout_fidelity",
           "evaluate_trainer_rollout", "evaluate_layout_rollout"]

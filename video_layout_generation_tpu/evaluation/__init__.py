from .metrics import confusion_matrix, iou_from_confusion, pixel_accuracy
from .export import save_colorized_png, save_npy_stack

__all__ = ["confusion_matrix", "iou_from_confusion", "pixel_accuracy",
           "save_colorized_png", "save_npy_stack"]

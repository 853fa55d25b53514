from .resize import (
    resize_bilinear,
    resize_nearest,
    upsample2x_bilinear_align,
    interp_matrix,
)
from .pooling import avg_pool_3x3_valid, max_pool_2x2
from .colorize import CITYSCAPES_COLORS, colorize_seg
from .one_hot import seg_one_hot
from .coords import add_coord_channels
from .boxes import mask2box

__all__ = [
    "resize_bilinear",
    "resize_nearest",
    "upsample2x_bilinear_align",
    "interp_matrix",
    "avg_pool_3x3_valid",
    "max_pool_2x2",
    "CITYSCAPES_COLORS",
    "colorize_seg",
    "seg_one_hot",
    "add_coord_channels",
    "mask2box",
]

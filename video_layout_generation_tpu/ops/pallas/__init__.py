from .instance_norm import instance_norm_pallas
from .ssim import ssim_loss_pallas

__all__ = ["instance_norm_pallas", "ssim_loss_pallas"]

from .pixel import l1_loss, gradient_loss
from .ssim import ssim_loss
from .vgg import VGG19Features, vgg_feature_loss, make_vgg_loss
from .combined import CombinedLoss
from .ce import cross_entropy_loss, weighted_masked_ce
from .gan import gan_loss, gradient_penalty

__all__ = [
    "l1_loss", "gradient_loss", "ssim_loss", "VGG19Features",
    "vgg_feature_loss", "make_vgg_loss", "CombinedLoss",
    "cross_entropy_loss", "weighted_masked_ce", "gan_loss",
    "gradient_penalty",
]

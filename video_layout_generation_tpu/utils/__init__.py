from .meters import AverageMeter, StepTimer
from .trees import param_count, tree_cast

__all__ = ["AverageMeter", "StepTimer", "param_count", "tree_cast"]

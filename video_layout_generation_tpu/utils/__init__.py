from .meters import AverageMeter, StepTimer
from .trees import param_count, tree_cast
from .profiling import Throughput, annotate, trace

__all__ = ["AverageMeter", "StepTimer", "param_count", "tree_cast",
           "Throughput", "annotate", "trace"]

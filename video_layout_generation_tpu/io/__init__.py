from .checkpoint import CheckpointManager
from .logging import get_logger
from .tb import SummaryWriter

__all__ = ["CheckpointManager", "get_logger", "SummaryWriter"]

from .index import build_triplet_index
from .synthetic import SyntheticTriplets
from .cityscapes import CityscapesTriplets
from .pipeline import HostLoader, ShardedLoader

__all__ = ["build_triplet_index", "SyntheticTriplets", "CityscapesTriplets",
           "HostLoader", "ShardedLoader"]

from .instance_norm import instance_norm_pallas

__all__ = ["instance_norm_pallas"]

"""Weight initializers matching the reference's ``init_weights`` options
(reference src/models/networks.py:67-98): normal | xavier | kaiming |
orthogonal, plus the init_gain scaling. Returned as flax kernel initializers
so they apply at module construction (no post-hoc mutation needed)."""

from __future__ import annotations

from jax.nn import initializers as I


def get_initializer(init_type: str = "normal", init_gain: float = 0.02):
    if init_type == "normal":
        return I.normal(stddev=init_gain)
    if init_type == "xavier":
        # torch xavier_normal_ with gain => scale = gain^2 (variance scaling)
        return I.variance_scaling(init_gain ** 2, "fan_avg", "normal")
    if init_type == "kaiming":
        # torch kaiming_normal_(a=0, mode='fan_in') => He normal
        return I.variance_scaling(2.0, "fan_in", "normal")
    if init_type == "orthogonal":
        return I.orthogonal(scale=init_gain)
    raise NotImplementedError(
        f"initialization method [{init_type}] is not implemented")

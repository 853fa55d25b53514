"""Normalization layer factory (reference src/models/networks.py:18-35).

- 'instance': per-sample per-channel over H,W, no affine params, no running
  stats (torch InstanceNorm2d(affine=False, track_running_stats=False)).
- 'batch': affine BatchNorm with running stats (torch BatchNorm2d defaults);
  callers must thread the flax ``batch_stats`` collection.
- 'none': identity.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


class InstanceNorm(nn.Module):
    """InstanceNorm over the H,W axes of NHWC, non-affine.

    On TPU with lane-aligned channels this dispatches to the fused
    single-pass Pallas kernel (ops/pallas/instance_norm.py); elsewhere the
    plain XLA formulation.
    """
    epsilon: float = 1e-5
    dtype: Optional[Any] = None
    use_pallas: bool = True

    @nn.compact
    def __call__(self, x):
        if self.use_pallas and x.ndim == 4 and _on_tpu():
            from ..ops.pallas.instance_norm import instance_norm_pallas
            return instance_norm_pallas(x, self.epsilon)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(-3, -2), keepdims=True)
        var = jnp.var(xf, axis=(-3, -2), keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y.astype(x.dtype)


class Identity(nn.Module):
    @nn.compact
    def __call__(self, x):
        return x


def get_norm_layer(norm_type: str = "instance", dtype: Optional[Any] = None,
                   train: bool = False) -> Callable[..., nn.Module]:
    if norm_type == "instance":
        return lambda name=None: InstanceNorm(dtype=dtype, name=name)
    if norm_type == "batch":
        # momentum 0.9 == torch's (1 - 0.1) convention
        return lambda name=None: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=dtype, name=name)
    if norm_type == "none":
        return lambda name=None: Identity(name=name)
    raise NotImplementedError(
        f"normalization layer [{norm_type}] is not found")


def norm_uses_bias(norm_type: str) -> bool:
    """Convs followed by BatchNorm skip bias (reference
    src/models/networks.py:336-339)."""
    return norm_type != "batch"

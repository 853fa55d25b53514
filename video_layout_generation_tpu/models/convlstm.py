"""ConvLSTM layout predictor.

BASELINE.json's benchmark configs call for a ConvLSTM rollout variant
(4-frame conditional layout prediction). TPU-first implementation: the
gates are a single fused 3x3 conv producing 4*hidden channels (one MXU
GEMM per step instead of four), the time axis is a ``lax.scan``, and
states stay in the compute dtype.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class ConvLSTMCell(nn.Module):
    """Peephole-free ConvLSTM cell (Shi et al. 2015) with fused gate conv."""
    hidden: int = 64
    kernel: int = 3
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, carry, x):
        h, c = carry
        k = self.kernel
        pad = ((k // 2, k // 2), (k // 2, k // 2))
        gates = nn.Conv(4 * self.hidden, (k, k), padding=pad,
                        dtype=self.dtype, name="gates")(
                            jnp.concatenate([x, h], axis=-1))
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = nn.sigmoid(i)
        f = nn.sigmoid(f + 1.0)    # forget-gate bias init trick
        g = jnp.tanh(g)
        o = nn.sigmoid(o)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    @staticmethod
    def init_carry(batch: int, hw: Tuple[int, int], hidden: int,
                   dtype=jnp.float32):
        shape = (batch, hw[0], hw[1], hidden)
        return (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


class ConvLSTMLayoutPredictor(nn.Module):
    """Encode each context layout, run ConvLSTM over time, decode the next
    layout's logits. ``rollout`` continues autoregressively.
    """
    n_classes: int = 20
    hidden: int = 64
    enc_width: int = 32
    dtype: Optional[Dtype] = None

    def setup(self):
        dt = self.dtype
        self.enc = nn.Conv(self.enc_width, (3, 3), strides=(2, 2),
                           padding=((1, 1), (1, 1)), dtype=dt, name="enc")
        self.cell = ConvLSTMCell(self.hidden, dtype=dt)
        self.dec = nn.ConvTranspose(self.n_classes, (3, 3), strides=(2, 2),
                                    padding="SAME", dtype=dt, name="dec")

    def _encode(self, onehot):
        return nn.relu(self.enc(onehot.astype(self.dtype or jnp.float32)))

    def _decode(self, h):
        return self.dec(h).astype(jnp.float32)

    def __call__(self, context_onehots):
        """context_onehots: (N, T, H, W, n_classes). Returns logits for the
        frame after the context, (N, H, W, n_classes)."""
        n, t, hgt, wdt, _ = context_onehots.shape
        carry = ConvLSTMCell.init_carry(
            n, (hgt // 2, wdt // 2), self.hidden,
            self.dtype or jnp.float32)
        # static time axis: a python loop unrolls under jit with shared
        # cell params (cheap for the short contexts this model targets)
        for i in range(t):
            feat = self._encode(context_onehots[:, i])
            carry, _ = self.cell(carry, feat)
        return self._decode(carry[0])

    def rollout(self, context_onehots, n_frames: int):
        """Continue autoregressively for n_frames; returns (N, T, H, W) ids."""
        n, t, hgt, wdt, ncls = context_onehots.shape
        carry = ConvLSTMCell.init_carry(
            n, (hgt // 2, wdt // 2), self.hidden,
            self.dtype or jnp.float32)
        for i in range(t):
            feat = self._encode(context_onehots[:, i])
            carry, _ = self.cell(carry, feat)
        outs = []
        for _ in range(n_frames):
            logits = self._decode(carry[0])
            ids = jnp.argmax(logits, axis=-1)
            outs.append(ids)
            feat = self._encode(jax.nn.one_hot(ids, ncls))
            carry, _ = self.cell(carry, feat)
        return jnp.stack(outs, axis=1)

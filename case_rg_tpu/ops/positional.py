"""Sinusoidal positional embedding.

TPU-native rebuild of common/PositionalEmbedding.py:5-48: the input embedding
is scaled by sqrt(d) then summed with a fixed sin/cos table, followed by
dropout. The table is generated inside the trace (constant-folded by XLA)
instead of registered as a buffer.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import flax.linen as nn
from .dropout import Dropout


def sinusoid_table(max_len: int, dim: int, dtype=np.float32) -> np.ndarray:
    """[max_len, dim] table; pe[:, 0::2]=sin, pe[:, 1::2]=cos
    (ref: common/PositionalEmbedding.py:27-31)."""
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div_term = np.exp(np.arange(0, dim, 2, dtype=np.float64) * (-np.log(10000.0) / dim))
    pe = np.zeros((max_len, dim), dtype=np.float64)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term[: pe[:, 1::2].shape[1]])
    return pe.astype(dtype)


class PositionalEmbedding(nn.Module):
    """x * sqrt(d) + PE, then dropout (ref: common/PositionalEmbedding.py:34-48).

    Works on [..., L, D]; ``offset`` supports incremental decoding where the
    current token sits at absolute position ``offset``.
    """

    dim: int
    dropout: float = 0.1
    max_len: int = 1000

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, offset: int | jnp.ndarray = 0,
                 deterministic: bool = True) -> jnp.ndarray:
        table = jnp.asarray(sinusoid_table(self.max_len, self.dim), dtype=x.dtype)
        length = x.shape[-2]
        if isinstance(offset, int) and offset == 0:
            pe = table[:length]
        elif not isinstance(offset, int) and getattr(offset, "ndim", 0) == 1:
            # per-row offsets [B] (continuous-batching decode: rows sit at
            # different absolute positions) -> pe [B, L, D]
            pe = jnp.take(table, offset[:, None] + jnp.arange(length)[None],
                          axis=0)
        else:
            pe = jnp.take(table, offset + jnp.arange(length), axis=0)
        x = x * jnp.asarray(np.sqrt(self.dim), x.dtype) + pe
        if self.dropout > 0.0:
            x = Dropout(rate=self.dropout)(x, deterministic=deterministic)
        return x

"""4-D Transformer block for the ranking towers.

TPU-native rebuild of common/TransformerBlock.py:7-33: self-attention plus a
2-layer FFN over [B, num_seq, L, Din] inputs (sequences folded into the batch
dimension), with the reference's exact quirks preserved:

* the residual is only around the attention (the FFN output *replaces* the
  stream rather than being added — TransformerBlock.py:28-29);
* the FFN may change the width (first tower block maps 5D -> D);
* activation is ReLU;
* padded positions are zeroed on the way out (TransformerBlock.py:32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from .attention import MultiHeadAttention
from .dropout import Dropout

_LN_EPS = 1e-5


class TransformerBlock(nn.Module):
    num_heads: int
    input_size: int
    output_size: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, keep: jnp.ndarray,
                 *, deterministic: bool = True) -> jnp.ndarray:
        b, n, l, d = x.shape
        h = x.reshape(b * n, l, d)
        keep2 = keep.reshape(b * n, l)
        normed = nn.LayerNorm(epsilon=_LN_EPS, name="norm1")(h)
        a, _ = MultiHeadAttention(self.input_size, self.num_heads, self.dropout,
                                  name="self_attn")(
            normed, normed, normed, key_keep=keep2, deterministic=deterministic)
        h = h + Dropout(self.dropout)(a, deterministic=deterministic)
        h = nn.LayerNorm(epsilon=_LN_EPS, name="norm2")(h)
        init = nn.initializers.xavier_uniform()
        h = jax.nn.relu(nn.Dense(self.output_size, kernel_init=init, name="linear1")(h))
        h = Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.output_size, kernel_init=init, name="linear2")(h)
        h = h.reshape(b, n, l, self.output_size)
        return jnp.where(keep[..., None], h, 0.0)

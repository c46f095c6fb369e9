"""Token embedding with a frozen-zero padding row.

Replaces ``nn.Embedding(..., padding_idx=0)`` (used throughout the reference,
e.g. common/TransformerSeqEncoderDecoder.py:21). Instead of masking gradients
we gate the lookup on ``ids != 0``: the forward value for PAD is exactly zero
and its gradient vanishes, which keeps row 0 frozen at zero forever.

(The reference's global xavier re-init at common/CumulativeTrainer.py:13-24
actually overwrites torch's zeroed padding row with random values that then
never train; a zero row is the cleaner equivalent and every consumer masks
PAD positions anyway.)
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn


class Embedding(nn.Module):
    vocab_size: int
    features: int

    @nn.compact
    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        table = self.param("embedding", nn.initializers.xavier_uniform(),
                           (self.vocab_size, self.features))
        out = jnp.take(table, ids, axis=0)
        return jnp.where((ids != 0)[..., None], out, 0.0)

    @staticmethod
    def attend_logits(table: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        return x @ table.T

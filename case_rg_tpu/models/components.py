"""Shared encoder components.

* ``TransformerSeqEncoder`` — embed + sinusoidal PE + shared pre-norm encoder
  over [B, num_seq, L] id batches, with masked-mean sequence states
  (ref: common/TransformerSeqEncoderDecoder.py:14-45; the reference's
  vestigial layer axis — unsqueeze(2) then [:, :, -1] at every call site —
  is dropped).
* ``GRUSeqEncoder`` — n stacked 1-layer bi-GRUs where each layer re-concats
  a freshly-dropped-out embedding of the inputs
  (ref: common/GRUSeqEncoderDecoder.py:6-40 and GLKS's GenEncoder,
  GLKS/Model.py:6-34). Returns per-layer outputs and states.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import flax.linen as nn

from ..ops.embedding import Embedding
from ..ops.gru import GRU
from ..ops.masking import masked_mean, padding_mask
from ..ops.positional import PositionalEmbedding
from ..ops.transformer import Encoder
from ..ops.dropout import Dropout


class TransformerSeqEncoder(nn.Module):
    num_layers: int
    num_heads: int
    vocab_size: int
    hidden_size: int
    dropout: float = 0.1
    max_len: int = 1000

    def setup(self):
        self.embedding = Embedding(self.vocab_size, self.hidden_size)
        self.pos = PositionalEmbedding(self.hidden_size, dropout=self.dropout,
                                       max_len=self.max_len)
        self.enc = Encoder(self.num_layers, self.hidden_size, self.num_heads,
                           d_ff=self.hidden_size, dropout=self.dropout,
                           activation="gelu")

    def __call__(self, ids: jnp.ndarray, *, deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """ids: [B, num_seq, L] -> (output [B, num_seq, L, D],
        state [B, num_seq, D])."""
        b, n, l = ids.shape
        flat = ids.reshape(b * n, l)
        keep = padding_mask(flat)
        emb = self.pos(self.embedding(flat), deterministic=deterministic)
        out = self.enc(emb, keep, deterministic=deterministic)
        state = masked_mean(out, keep)
        return out.reshape(b, n, l, -1), state.reshape(b, n, -1)


class GRUSeqEncoder(nn.Module):
    """n bi-GRU layers with per-layer embedding re-concat."""

    num_layers: int
    vocab_size: int
    embedding_size: int
    hidden_size: int
    dropout: float = 0.5
    share_embedding_per_layer: bool = True

    def setup(self):
        n_emb = 1 if self.share_embedding_per_layer else self.num_layers
        self.embeddings = [Embedding(self.vocab_size, self.embedding_size,
                                     name=f"embedding{i}") for i in range(n_emb)]
        grus = []
        for i in range(self.num_layers):
            in_size = self.embedding_size if i == 0 else self.embedding_size + self.hidden_size
            grus.append(GRU(input_size=in_size, hidden_size=self.hidden_size // 2,
                            num_layers=1, bidirectional=True, name=f"gru{i}"))
        self.grus = grus
        self.drop = Dropout(self.dropout)

    def _emb(self, i: int, ids, deterministic: bool):
        e = self.embeddings[i if not self.share_embedding_per_layer else 0]
        return self.drop(e(ids), deterministic=deterministic)

    def __call__(self, ids: jnp.ndarray, *, deterministic: bool = True):
        """ids: [B, L] -> (outputs [B, n_layers, L, H], states [B, n_layers, H])."""
        mask = padding_mask(ids)
        outs, states = [], []
        cur = self._emb(0, ids, deterministic)
        for i in range(self.num_layers):
            if i > 0:
                cur = jnp.concatenate([cur, self._emb(i, ids, deterministic)], axis=-1)
            cur, st = self.grus[i](cur, mask)
            outs.append(cur)
            states.append(st.reshape(st.shape[0], -1))  # [B, 2*(H/2)] = [B, H]
        return jnp.stack(outs, axis=1), jnp.stack(states, axis=1)

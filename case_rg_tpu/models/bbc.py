"""Background-context (BBC) GRU decoder core shared by S2SA and GTTP.

TPU-native rebuild of the byte-identical ``BBCDecoder`` classes
(S2SA/Model.py:4-48, GTTP/Model.py:87-131): per step, additive attention from
the previous decoder state over the context and background encodings, a GRU
cell over [embedded, src_context, bg_context], and a readout feature.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import flax.linen as nn

from ..ops.bilinear import BilinearAttention
from ..ops.embedding import Embedding
from ..ops.gru import GRU
from ..ops.dropout import Dropout


class BBCCore(nn.Module):
    vocab_size: int
    embedding_size: int
    hidden_size: int
    num_layers: int = 1
    dropout: float = 0.5

    def setup(self):
        e, h = self.embedding_size, self.hidden_size
        self.embedding = Embedding(self.vocab_size, e)
        self.emb_drop = Dropout(self.dropout)
        self.src_attn = BilinearAttention(query_size=h, key_size=2 * h, hidden_size=h)
        self.bg_attn = BilinearAttention(query_size=h, key_size=2 * h, hidden_size=h)
        self.gru = GRU(input_size=4 * h + e, hidden_size=h, num_layers=self.num_layers)
        self.readout = nn.Dense(h, kernel_init=nn.initializers.xavier_uniform())

    def embed(self, ids: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        return self.emb_drop(self.embedding(ids), deterministic=deterministic)

    def key_projs(self, src_out: jnp.ndarray, bg_out: jnp.ndarray):
        """Precompute attention key projections for the fixed encodings
        (hoisted out of per-step decode/train scans)."""
        return self.src_attn.key_proj(src_out), self.bg_attn.key_proj(bg_out)

    def step(self, emb: jnp.ndarray, state: jnp.ndarray,
             src_out: jnp.ndarray, bg_out: jnp.ndarray,
             src_keep: jnp.ndarray, bg_keep: jnp.ndarray,
             src_uh: jnp.ndarray = None, bg_uh: jnp.ndarray = None,
             ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """emb: [B, E] (already dropout-ed); state: [B, layers, H].
        Returns (feature [B, H], new_state, src_attn [B, Lc], bg_attn [B, Lb])."""
        q = state[:, -1:]  # [B, 1, H]
        if src_uh is None or bg_uh is None:
            src_uh, bg_uh = self.key_projs(src_out, bg_out)
        src_ctx, _, src_w = self.src_attn.attend_from_proj(
            q, src_uh, src_out, mask=src_keep[:, None, :])
        bg_ctx, _, bg_w = self.bg_attn.attend_from_proj(
            q, bg_uh, bg_out, mask=bg_keep[:, None, :])
        src_ctx, bg_ctx = src_ctx[:, 0], bg_ctx[:, 0]
        gru_in = jnp.concatenate([emb, src_ctx, bg_ctx], axis=-1)
        _, state = self.gru.step(gru_in, state)
        concat = jnp.concatenate([emb, state[:, -1], src_ctx, bg_ctx], axis=-1)
        return self.readout(concat), state, src_w[:, 0], bg_w[:, 0]


class BBCEncoders(nn.Module):
    """Context/background bi-GRU encoders with shared embedding
    (ref: S2SA/Model.py:56-84, GTTP/Model.py:140-168)."""

    vocab_size: int
    embedding_size: int
    hidden_size: int
    dropout: float = 0.5

    def setup(self):
        e, h = self.embedding_size, self.hidden_size
        self.embedding = Embedding(self.vocab_size, e)
        self.c_drop = Dropout(self.dropout)
        self.b_drop = Dropout(self.dropout)
        self.c_enc = GRU(input_size=e, hidden_size=h, bidirectional=True)
        self.b_enc = GRU(input_size=e, hidden_size=h, bidirectional=True)
        self.enc2dec = nn.Dense(h, kernel_init=nn.initializers.xavier_uniform())

    def __call__(self, context: jnp.ndarray, background: jnp.ndarray,
                 *, deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        c_keep = context != 0
        b_keep = background != 0
        c_emb = self.c_drop(self.embedding(context), deterministic=deterministic)
        b_emb = self.b_drop(self.embedding(background), deterministic=deterministic)
        c_out, c_state = self.c_enc(c_emb, c_keep)
        b_out, b_state = self.b_enc(b_emb, b_keep)
        b = context.shape[0]
        init = self.enc2dec(c_state.reshape(b, -1))[:, None, :]  # [B, 1, H]
        return {"c_out": c_out, "b_out": b_out, "c_keep": c_keep,
                "b_keep": b_keep, "init_state": init}

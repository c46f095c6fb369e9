"""Interaction ranking towers shared by Masque and CaSE.

An ``InteractionTower`` is the reference's recurring pattern: dual
query<->passage interaction producing 5D features, then a stack of 4-D
transformer blocks (first block 5D -> D) over each side
(ref: Masque/Model.py:121-159 ``PassageSelection``,
CaSE/Model.py:127-163 ``RelevantPassageSelection``,
CaSE/Model.py:165-212 ``SupportingTokenIdentification``).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import flax.linen as nn

from ..ops.blocks import TransformerBlock
from ..ops.interaction import Interaction


class InteractionTower(nn.Module):
    hidden_size: int
    num_heads: int
    query_blocks: int      # total blocks on the query side (incl. 5D->D)
    passage_blocks: int
    dropout: float = 0.1

    def setup(self):
        d, h = self.hidden_size, self.num_heads
        self.interaction = Interaction(d)
        self.q_blocks = (
            [TransformerBlock(h, 5 * d, d, self.dropout, name="q_block0")]
            + [TransformerBlock(h, d, d, self.dropout, name=f"q_block{i}")
               for i in range(1, self.query_blocks)])
        self.p_blocks = (
            [TransformerBlock(h, 5 * d, d, self.dropout, name="p_block0")]
            + [TransformerBlock(h, d, d, self.dropout, name=f"p_block{i}")
               for i in range(1, self.passage_blocks)])

    def __call__(self, enc_query: jnp.ndarray, enc_passage: jnp.ndarray,
                 query_keep: jnp.ndarray, passage_keep: jnp.ndarray,
                 *, deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """enc_query: [B, 1, Lq, D], enc_passage: [B, P, Lp, D] ->
        (query_reps [B, 1, Lq, D], passage_reps [B, P, Lp, D])."""
        g_p_q, g_q_p = self.interaction(enc_query, enc_passage,
                                        query_keep, passage_keep)
        q = g_p_q
        for blk in self.q_blocks:
            q = blk(q, query_keep, deterministic=deterministic)
        p = g_q_p
        for blk in self.p_blocks:
            p = blk(p, passage_keep, deterministic=deterministic)
        return q, p

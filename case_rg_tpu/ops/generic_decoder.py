"""Highway-gated multi-memory decoder layer.

TPU-native rebuild of ``GenericTransformerDecoderLayer``
(common/TransformerDecoder.py:95-164): self-attention and N chained memory
attentions, each fused into the stream with a Highway gate over
[stream ; dropout(attn_out)], followed by a residual FFN. The reference
defines it but none of the six models instantiate it; it is part of the
public ops surface and kept for capability parity.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn

from .attention import MultiHeadAttention
from .highway import Highway
from .masking import causal_mask
from .dropout import Dropout

_LN_EPS = 1e-5


class GenericDecoderLayer(nn.Module):
    num_memories: int
    d_model: int
    num_heads: int
    d_ff: int
    dropout: float = 0.1
    activation: str = "gelu"

    def setup(self):
        d = self.d_model
        self.self_attn = MultiHeadAttention(d, self.num_heads, self.dropout)
        self.self_norm = nn.LayerNorm(epsilon=_LN_EPS)
        self.self_highway = Highway(2 * d, d)
        self.memory_attns = [MultiHeadAttention(d, self.num_heads, self.dropout,
                                                name=f"memory_attn{i}")
                             for i in range(self.num_memories)]
        self.memory_norms = [nn.LayerNorm(epsilon=_LN_EPS, name=f"memory_norm{i}")
                             for i in range(self.num_memories)]
        self.memory_highways = [Highway(2 * d, d, name=f"memory_highway{i}")
                                for i in range(self.num_memories)]
        init = nn.initializers.xavier_uniform()
        self.linear1 = nn.Dense(self.d_ff, kernel_init=init)
        self.linear2 = nn.Dense(d, kernel_init=init)
        self.drop = Dropout(self.dropout)

    def __call__(self, tgt: jnp.ndarray, memories: Sequence[jnp.ndarray],
                 tgt_keep: Optional[jnp.ndarray] = None,
                 mem_keeps: Optional[Sequence[jnp.ndarray]] = None,
                 *, causal: bool = True, deterministic: bool = True
                 ) -> jnp.ndarray:
        import jax

        bias = causal_mask(tgt.shape[1], tgt.dtype) if causal else None
        x = self.self_norm(tgt)
        a, _ = self.self_attn(x, x, x, attn_bias=bias, key_keep=tgt_keep,
                              deterministic=deterministic)
        x = self.self_highway(jnp.concatenate(
            [x, self.drop(a, deterministic=deterministic)], axis=-1))

        for i in range(self.num_memories):
            x = self.memory_norms[i](x)
            mk = mem_keeps[i] if mem_keeps is not None else None
            a, _ = self.memory_attns[i](x, memories[i], memories[i],
                                        key_keep=mk,
                                        deterministic=deterministic)
            x = self.memory_highways[i](jnp.concatenate(
                [x, self.drop(a, deterministic=deterministic)], axis=-1))

        act = jax.nn.gelu if self.activation == "gelu" else jax.nn.relu
        f = self.linear2(self.drop(act(self.linear1(x), approximate=False)
                                   if self.activation == "gelu"
                                   else act(self.linear1(x)),
                                   deterministic=deterministic))
        return x + self.drop(f, deterministic=deterministic)

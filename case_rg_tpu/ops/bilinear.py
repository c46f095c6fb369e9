"""Additive (Bahdanau-style) attention.

TPU-native rebuild of common/BilinearAttention.py:5-59 (the reference's name
notwithstanding, the score is ``v . tanh(W q + U k)``). Broadcasting follows
the reference: query [.., Lq, Dq], key [.., Lk, Dk], mask [.., Lq, Lk].
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import flax.linen as nn

from .masking import masked_softmax, neg_inf


class BilinearAttention(nn.Module):
    query_size: int
    key_size: int
    hidden_size: int

    def setup(self):
        init = nn.initializers.xavier_uniform()
        self.linear_key = nn.Dense(self.hidden_size, use_bias=False, kernel_init=init)
        self.linear_query = nn.Dense(self.hidden_size, use_bias=True, kernel_init=init)
        self.v = nn.Dense(1, use_bias=False, kernel_init=init)

    def key_proj(self, key: jnp.ndarray) -> jnp.ndarray:
        """Precompute U k for a fixed memory (hoisted out of decode scans)."""
        return self.linear_key(key)

    def matching_from_proj(self, query: jnp.ndarray, uh: jnp.ndarray,
                           mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Scores given an already-projected key ``uh = linear_key(key)``."""
        wq = self.linear_query(query)[..., :, None, :]
        attn = self.v(jnp.tanh(wq + uh[..., None, :, :]))[..., 0]
        if mask is not None:
            attn = jnp.where(mask, attn, neg_inf(attn.dtype))
        return attn

    def matching(self, query: jnp.ndarray, key: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Raw scores [.., Lq, Lk] (ref: BilinearAttention.py:24-46)."""
        return self.matching_from_proj(query, self.key_proj(key), mask)

    def score(self, query, key, mask=None, softmax_axis: int = -1):
        """(raw, normalized) scores; normalized zeros where masked
        (ref: BilinearAttention.py:13-21)."""
        raw = self.matching(query, key, mask=None)
        norm = masked_softmax(raw, mask, axis=softmax_axis)
        if mask is not None:
            raw = jnp.where(mask, raw, neg_inf(raw.dtype))
        return raw, norm

    def attend_from_proj(self, query, uh, value, mask=None):
        """Full attention given precomputed key projections."""
        raw = self.matching_from_proj(query, uh, mask=None)
        norm = masked_softmax(raw, mask, axis=-1)
        ctx = jnp.einsum("...qk,...kd->...qd", norm, value)
        return ctx, raw, norm

    def __call__(self, query, key, value, mask=None) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """context [.., Lq, Dv], raw scores, normalized scores
        (ref: BilinearAttention.py:48-59)."""
        raw, norm = self.score(query, key, mask=mask)
        ctx = jnp.einsum("...qk,...kd->...qd", norm, value)
        return ctx, raw, norm

"""Pre-norm transformer encoder/decoder layers and stacks.

TPU-native rebuild of the reference's customized layers
(ref: common/TransformerEncoder.py:19-122, common/TransformerDecoder.py:21-217).
The reference uses an unusual "pre-norm" ordering in which the residual is
taken around the *normalized* stream::

    src = norm1(src); src = src + drop(attn(src))
    src = norm2(src); src = src + drop(ffn(src))

(and the three-norm analogue for the decoder). We reproduce that ordering
exactly — it changes the function computed, not just conditioning.

Decoding: the reference re-runs the whole prefix every step with no KV cache
(e.g. CaSE/Model.py:94-122). Here each decoder layer supports an incremental
``step`` with a static-shape KV cache updated via ``dynamic_update_slice``,
which is mathematically identical at eval (dropout off, causal masking) and
turns the O(T^2) per-step recompute into O(T).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .attention import MultiHeadAttention
from .masking import causal_mask
from .dropout import Dropout

_LN_EPS = 1e-5  # torch LayerNorm default


def _dense(features: int, name: str) -> nn.Dense:
    return nn.Dense(features, name=name, kernel_init=nn.initializers.xavier_uniform())


class FeedForward(nn.Module):
    """linear1 -> activation -> dropout -> linear2 (ref: TransformerEncoder.py:71-74)."""

    d_model: int
    d_ff: int
    dropout: float = 0.1
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        h = _dense(self.d_ff, "linear1")(x)
        h = jax.nn.gelu(h, approximate=False) if self.activation == "gelu" else jax.nn.relu(h)
        h = Dropout(self.dropout)(h, deterministic=deterministic)
        return _dense(self.d_model, "linear2")(h)


class EncoderLayer(nn.Module):
    """Self-attention + FFN with the reference's norm/residual ordering
    (ref: common/TransformerEncoder.py:55-77)."""

    d_model: int
    num_heads: int
    d_ff: int
    dropout: float = 0.1
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x: jnp.ndarray, keep: Optional[jnp.ndarray] = None,
                 *, deterministic: bool = True) -> jnp.ndarray:
        x = nn.LayerNorm(epsilon=_LN_EPS, name="norm1")(x)
        a, _ = MultiHeadAttention(self.d_model, self.num_heads, self.dropout,
                                  name="self_attn")(
            x, x, x, key_keep=keep, deterministic=deterministic)
        x = x + Dropout(self.dropout)(a, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=_LN_EPS, name="norm2")(x)
        f = FeedForward(self.d_model, self.d_ff, self.dropout, self.activation,
                        name="ffn")(x, deterministic=deterministic)
        return x + Dropout(self.dropout)(f, deterministic=deterministic)


class Encoder(nn.Module):
    """Stack of encoder layers (ref: common/TransformerEncoder.py:82-122)."""

    num_layers: int
    d_model: int
    num_heads: int
    d_ff: int
    dropout: float = 0.1
    activation: str = "gelu"
    final_norm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, keep: Optional[jnp.ndarray] = None,
                 *, deterministic: bool = True) -> jnp.ndarray:
        for i in range(self.num_layers):
            x = EncoderLayer(self.d_model, self.num_heads, self.d_ff,
                             self.dropout, self.activation, name=f"layer{i}")(
                x, keep, deterministic=deterministic)
        if self.final_norm:
            x = nn.LayerNorm(epsilon=_LN_EPS, name="norm")(x)
        return x


class DecoderLayer(nn.Module):
    """Self-attn + cross-attn + FFN (ref: common/TransformerDecoder.py:61-90)."""

    d_model: int
    num_heads: int
    d_ff: int
    dropout: float = 0.1
    activation: str = "gelu"

    def setup(self):
        self.norm1 = nn.LayerNorm(epsilon=_LN_EPS)
        self.norm2 = nn.LayerNorm(epsilon=_LN_EPS)
        self.norm3 = nn.LayerNorm(epsilon=_LN_EPS)
        self.self_attn = MultiHeadAttention(self.d_model, self.num_heads, self.dropout)
        self.cross_attn = MultiHeadAttention(self.d_model, self.num_heads, self.dropout)
        self.ffn = FeedForward(self.d_model, self.d_ff, self.dropout, self.activation)
        self.drop = Dropout(self.dropout)

    def __call__(self, tgt: jnp.ndarray, memory: jnp.ndarray,
                 tgt_keep: Optional[jnp.ndarray] = None,
                 mem_keep: Optional[jnp.ndarray] = None,
                 *, deterministic: bool = True) -> jnp.ndarray:
        bias = causal_mask(tgt.shape[1], tgt.dtype)
        tgt = self.norm1(tgt)
        a, _ = self.self_attn(tgt, tgt, tgt, attn_bias=bias, key_keep=tgt_keep,
                              deterministic=deterministic)
        tgt = tgt + self.drop(a, deterministic=deterministic)
        tgt = self.norm2(tgt)
        c, _ = self.cross_attn(tgt, memory, memory, key_keep=mem_keep,
                               deterministic=deterministic)
        tgt = tgt + self.drop(c, deterministic=deterministic)
        tgt = self.norm3(tgt)
        f = self.ffn(tgt, deterministic=deterministic)
        return tgt + self.drop(f, deterministic=deterministic)

    # ---- incremental decoding ----

    def precompute_memory(self, memory: jnp.ndarray):
        """Project the encoder memory to K/V once per sequence."""
        return self.cross_attn.project_kv(memory)

    def step(self, x_t: jnp.ndarray, t: jnp.ndarray,
             cache: jnp.ndarray,
             hist_keep: jnp.ndarray,
             ck: jnp.ndarray, cv: jnp.ndarray,
             mem_keep: Optional[jnp.ndarray]):
        """One decode step. x_t: [B, 1, E]; ``cache``: packed K|V buffer
        [B, T_max, 2E] (one fused QKV matmul + one cache write per step —
        14% faster chain than separate k/v projections and writes,
        tools/exp_decode_chain.py); hist_keep: [B, T_max] True for valid,
        already-written positions *including* t. ``t`` may be a scalar
        (scan decode) or [B] per-row indices (continuous batching).
        Returns (y_t, cache)."""
        from .cache import write_step

        e = self.d_model
        x = self.norm1(x_t)
        q, kv_t = self.self_attn.project_qkv(x)
        cache = write_step(cache, kv_t, t)
        a, _ = self.self_attn.attend_with_kv_merged(
            q, cache[..., :e], cache[..., e:], key_keep=hist_keep,
            q_projected=True)
        x = x + a   # residual around the normalized stream (module docstring)
        x = self.norm2(x)
        c, _ = self.cross_attn.attend_with_kv_merged(x, ck, cv,
                                                     key_keep=mem_keep)
        x = x + c
        x = self.norm3(x)
        return x + self.ffn(x, deterministic=True), cache


class Decoder(nn.Module):
    """Stack of decoder layers over one memory
    (ref: common/TransformerDecoder.py:169-217)."""

    num_layers: int
    d_model: int
    num_heads: int
    d_ff: int
    dropout: float = 0.1
    activation: str = "gelu"
    final_norm: bool = False

    def setup(self):
        self.layers = [DecoderLayer(self.d_model, self.num_heads, self.d_ff,
                                    self.dropout, self.activation, name=f"layer{i}")
                       for i in range(self.num_layers)]
        if self.final_norm:
            self.norm = nn.LayerNorm(epsilon=_LN_EPS)

    def __call__(self, tgt, memory, tgt_keep=None, mem_keep=None,
                 *, deterministic: bool = True):
        for layer in self.layers:
            tgt = layer(tgt, memory, tgt_keep, mem_keep, deterministic=deterministic)
        if self.final_norm:
            tgt = self.norm(tgt)
        return tgt

    def precompute_memory(self, memory):
        return [layer.precompute_memory(memory) for layer in self.layers]

    def init_cache(self, batch: int, max_len: int, dtype=jnp.float32):
        """One packed K|V buffer [B, T_max, 2E] per layer."""
        return [jnp.zeros((batch, max_len, 2 * self.d_model), dtype)
                for _ in range(self.num_layers)]

    def step(self, x_t, t, cache, cross_kv, hist_keep, mem_keep):
        """x_t: [B, 1, E]; cache: list of packed K|V buffers per layer;
        cross_kv: list of (ck, cv) per layer. Returns (y_t, new_cache)."""
        new_cache = []
        for layer, c, (ck, cv) in zip(self.layers, cache, cross_kv):
            x_t, c = layer.step(x_t, t, c, hist_keep, ck, cv, mem_keep)
            new_cache.append(c)
        if self.final_norm:
            x_t = self.norm(x_t)
        return x_t, new_cache

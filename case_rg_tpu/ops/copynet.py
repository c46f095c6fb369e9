"""Copy-distribution machinery without one-hot maps.

The reference materializes a [B, L_src, V] one-hot "source map"
(common/Utils.py:344-355 ``build_map``) and multiplies attention mass through
it with a bmm (e.g. CaSE/Model.py:43, GTTP/Model.py:38-41) — mid-GB float
traffic per batch at V=30k. On TPU we instead scatter-add the attention mass
directly onto vocabulary ids (O(B*T*L) work, no [B,L,V] intermediate), and
for training losses we never materialize the full distribution at all:
``copy_prob_at`` gathers the probability of the target token with a masked
sum over source positions.
"""

from __future__ import annotations

import jax.numpy as jnp


def copy_scatter(weights: jnp.ndarray, src_ids: jnp.ndarray,
                 vocab_size: int) -> jnp.ndarray:
    """Scatter attention mass onto the vocabulary.

    weights: [B, T, L] (or [B, L]); src_ids: [B, L] int vocab ids.
    Returns [B, T, V] (or [B, V]) with out[b, t, v] = sum_{l: ids[b,l]=v} w.
    Equivalent to ``bmm(weights, build_map(src_ids, V))``.
    """
    squeeze = weights.ndim == 2
    if squeeze:
        weights = weights[:, None, :]
    b, t, l = weights.shape
    # accumulate in f32: the TPU scatter path runs ~1.5x FASTER in f32 than
    # bf16 (tools/exp_scatter_variants.py: 542 vs 801 us at B=64 L=1060)
    # and the rounding of the duplicate-id accumulation improves; the f32
    # parity dtype is unchanged by this.
    acc = jnp.float32 if weights.dtype in (jnp.bfloat16, jnp.float16) \
        else weights.dtype
    out = jnp.zeros((b, t, vocab_size), acc)
    bi = jnp.arange(b)[:, None, None]
    ti = jnp.arange(t)[None, :, None]
    out = out.at[bi, ti, src_ids[:, None, :]].add(weights.astype(acc))
    out = out.astype(weights.dtype)
    if squeeze:
        out = out[:, 0]
    return out


def copy_prob_at(weights: jnp.ndarray, src_ids: jnp.ndarray,
                 target_ids: jnp.ndarray) -> jnp.ndarray:
    """Probability mass copied onto each target token.

    weights: [B, T, L]; src_ids: [B, L]; target_ids: [B, T].
    Returns [B, T] with out[b, t] = sum_l weights[b,t,l] * [ids[b,l]==tgt[b,t]].
    """
    match = (src_ids[:, None, :] == target_ids[:, :, None]).astype(weights.dtype)
    return jnp.einsum("btl,btl->bt", weights, match)

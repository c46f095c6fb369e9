"""Mask / numerics helpers shared across ops.

TPU-native equivalents of the reference's mask utilities
(ref: common/Utils.py:16-28 ``neginf``/``generate_square_subsequent_mask``,
common/Utils.py:455-470 ``universal_sentence_embedding``). Everything is
shape-static and jit-friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# A representable finite stand-in for -inf (ref: common/Utils.py:14-21).
NEG_INF = -1e20


def neg_inf(dtype) -> float:
    dtype = jnp.dtype(dtype)
    if dtype == jnp.float16:
        return -65504.0
    return NEG_INF


def padding_mask(ids: jnp.ndarray) -> jnp.ndarray:
    """True where a token is real (id != 0). (ref: ``.ne(0)`` call-sites.)"""
    return ids != 0


def causal_mask(length: int, dtype=jnp.float32) -> jnp.ndarray:
    """[L, L] additive mask: 0 on/below the diagonal, ~-inf above.

    Equivalent to common/Utils.py:23-28 but built once per trace with static
    shape instead of a host-side tensor moved to device per step.
    """
    i = jnp.arange(length)[:, None]
    j = jnp.arange(length)[None, :]
    return jnp.where(j <= i, 0.0, neg_inf(dtype)).astype(dtype)


def _softmax(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    x_max = jax.lax.stop_gradient(jnp.max(x, axis=axis, keepdims=True))
    unnorm = jnp.exp(x - x_max)
    return unnorm / jnp.sum(unnorm, axis=axis, keepdims=True)


def masked_softmax(logits: jnp.ndarray, mask: jnp.ndarray | None, axis: int = -1,
                   zero_fully_masked: bool = True) -> jnp.ndarray:
    """Softmax over ``axis`` with boolean ``mask`` (True = keep).

    Matches the reference pattern ``softmax(masked_fill(x, ~m, -inf))`` then
    ``masked_fill(p, ~m, 0)`` (e.g. common/BilinearAttention.py:13-21,
    common/Interaction.py:42-47), with a safe branch for rows where every key
    is masked (torch would produce NaN; we produce zeros).
    """
    if mask is None:
        return _softmax(logits, axis)
    big_neg = neg_inf(logits.dtype)
    masked = jnp.where(mask, logits, big_neg)
    out = _softmax(masked, axis)
    out = jnp.where(mask, out, jnp.zeros((), out.dtype))
    if zero_fully_masked:
        any_valid = jnp.any(mask, axis=axis, keepdims=True)
        out = jnp.where(any_valid, out, jnp.zeros((), out.dtype))
    return out


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, sqrt: bool = False,
                eps: float = 0.0) -> jnp.ndarray:
    """Mean (or sum/sqrt(n)) pool over the length axis.

    ``universal_sentence_embedding`` (common/Utils.py:455-470; the TMemNet copy
    at TMemNet/Model.py:25-40 defaults ``sqrt=True``). x: [..., L, D],
    mask: [..., L] -> [..., D].
    """
    m = mask.astype(x.dtype)[..., None]
    total = jnp.sum(x * m, axis=-2)
    count = jnp.sum(m, axis=-2)
    if sqrt:
        count = jnp.sqrt(count)
    return total / (count + eps)


def lengths_from_mask(mask: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(mask.astype(jnp.int32), axis=-1)

"""Pallas TPU kernel: fused single-query multi-head attention (decode).

The decode hot loop attends one query token over large fixed memories
(cross-attention K/V of [B, 1000, 256] per layer). XLA's einsum lowering for
this shape achieves only ~196 GB/s effective K/V bandwidth (docs/PERF.md);
this kernel streams each K/V tile through VMEM exactly once with an online
(flash) softmax, targeting the HBM roofline.

Math trick for merged-layout heads: scores for all H heads come from ONE
MXU matmul ``k_tile [Lt, E] @ q_blockdiag [E, H]`` where ``q_blockdiag``
places the scaled query head-slices block-diagonally; the PV product
``p^T [H, Lt] @ v_tile [Lt, E] -> [H, E]`` keeps only its block-diagonal
head slices via a precomputed head mask. No [B, L, H, d] reshapes or
transposes ever touch the cache.

Exactness: identical attention math up to floating-point reassociation of
the online softmax (the two-pass XLA softmax groups differently).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

L_TILE = 512
NEG = -1e30


def _kernel(qbd_ref, k_ref, v_ref, mask_ref, hmask_ref, out_ref,
            m_ref, l_ref, acc_ref):
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    k = k_ref[0]                      # [Lt, E]
    v = v_ref[0]                      # [Lt, E]
    qbd = qbd_ref[0]                  # [E, H]
    # f32 arithmetic masking throughout: Mosaic cannot reshape 1-bit vectors
    mask = mask_ref[0, 0].reshape(k.shape[0], 1)   # [Lt, 1], 1.0 valid

    s = jnp.dot(k, qbd, preferred_element_type=jnp.float32)   # [Lt, H]
    s = s + (mask - 1.0) * (-NEG)     # pad rows -> NEG

    m_old = m_ref[0]                  # [H]
    m_new = jnp.maximum(m_old, jnp.max(s, axis=0))
    corr = jnp.exp(m_old - m_new)     # [H]
    p = jnp.exp(s - m_new[None, :]) * mask   # [Lt, H]

    l_ref[0] = corr * l_ref[0] + jnp.sum(p, axis=0)
    m_ref[0] = m_new
    pv = jax.lax.dot_general(p, v.astype(jnp.float32),
                             dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)   # [H, E]
    acc_ref[...] = corr[:, None] * acc_ref[...] + pv

    @pl.when(j == n_j - 1)
    def _finish():
        l = l_ref[0]                  # [H]
        validf = (l > 0).astype(jnp.float32)
        safe_l = l * validf + (1.0 - validf)
        ctx_he = acc_ref[...] / safe_l[:, None]          # [H, E]
        ctx_he = ctx_he * validf[:, None]
        # keep only each head's own E-slice and collapse to [E]
        out = jnp.sum(ctx_he * hmask_ref[...], axis=0)
        out_ref[0, 0] = out.astype(out_ref.dtype)


def _pad_l(x, mult):
    l = x.shape[1]
    rem = (-l) % mult
    if rem == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[1] = (0, rem)
    return jnp.pad(x, pad)


@functools.partial(jax.jit, static_argnums=(4, 5))
def single_query_mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     keep: jnp.ndarray, num_heads: int,
                     interpret: bool = False) -> jnp.ndarray:
    """q: [B, 1, E] (already in-projected); k/v: [B, L, E] (projected,
    merged layout); keep: [B, L] bool. Returns the pre-out-projection
    context [B, 1, E]."""
    b, _, e = q.shape
    h = num_heads
    d = e // h
    scale = 1.0 / np.sqrt(d)
    q_r = (q[:, 0].astype(jnp.float32) * scale).reshape(b, h, d)
    eye = jnp.eye(h, dtype=jnp.float32)
    # [B, H, d, H] -> [B, E, H], block-diagonal placement of head slices
    qbd = (q_r[:, :, :, None] * eye[:, None, :]).reshape(b, e, h)
    qbd = qbd.astype(k.dtype)
    hmask = jnp.repeat(eye, d, axis=1)               # [H, E]

    k_p = _pad_l(k, L_TILE)
    v_p = _pad_l(v, L_TILE)
    mask = _pad_l(keep.astype(jnp.float32)[:, :, None], L_TILE)[:, :, 0]
    mask = mask[:, None, :]                          # [B, 1, Lp] (tiling rules)
    lp = k_p.shape[1]
    grid = (b, lp // L_TILE)

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b, 1, e), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, e, h), lambda bi, j: (bi, 0, 0)),
            pl.BlockSpec((1, L_TILE, e), lambda bi, j: (bi, j, 0)),
            pl.BlockSpec((1, L_TILE, e), lambda bi, j: (bi, j, 0)),
            pl.BlockSpec((1, 1, L_TILE), lambda bi, j: (bi, 0, j)),
            pl.BlockSpec((h, e), lambda bi, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, e), lambda bi, j: (bi, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((1, h), jnp.float32),   # running max
            pltpu.VMEM((1, h), jnp.float32),   # running denom
            pltpu.VMEM((h, e), jnp.float32),   # running numerator
        ],
        interpret=interpret,
    )(qbd, k_p, v_p, mask, hmask)
    return out


def single_query_mha_xla(q, k, v, keep, num_heads):
    """Reference einsum implementation (same math, two-pass softmax)."""
    b, lq, e = q.shape
    h = num_heads
    d = e // h
    qh = q.reshape(b, lq, h, d)
    kh = k.reshape(b, -1, h, d)
    vh = v.reshape(b, -1, h, d)
    scores = jnp.einsum("bqhd,bkhd->bhqk", qh / np.sqrt(d), kh,
                        preferred_element_type=jnp.float32)
    scores = jnp.where(keep[:, None, None, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    any_valid = jnp.any(keep, axis=-1)[:, None, None, None]
    probs = jnp.where(any_valid, probs, 0.0)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(vh.dtype), vh)
    return ctx.reshape(b, lq, e)

"""Pallas TPU kernel: fused additive (Bahdanau) attention scores.

Computes ``scores[b, t, l] = sum_h tanh(wq[b,t,h] + uh[b,l,h]) * v[h]`` — the
scoring pattern of every BilinearAttention in the framework
(ref: common/BilinearAttention.py:24-46) — without materializing the
[B, T, L, H] broadcast tensor in HBM. Tiles of wq and uh are combined in
VMEM; each grid cell writes one [T_TILE, L_TILE] score block.

The public ``additive_scores`` pads T/L up to tile multiples (padded
positions produce garbage scores that callers mask before softmax, exactly
as with the XLA path) and wires a custom VJP whose backward recomputes
tanh blockwise with plain XLA (the dominant saving is the forward
materialization).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas is TPU-only in this environment; import lazily/defensively
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

T_TILE = 8
L_TILE = 128


def _kernel(wq_ref, uh_ref, v_ref, out_ref):
    w = wq_ref[0]          # [T_TILE, H]
    u = uh_ref[0]          # [L_TILE, H]
    v = v_ref[...]         # [1, H]
    t3 = jnp.tanh(w[:, None, :] + u[None, :, :])      # [T_TILE, L_TILE, H]
    out_ref[0] = jnp.sum(t3 * v[None, :, :], axis=-1)


def _pad_to(x, axis, mult):
    size = x.shape[axis]
    rem = (-size) % mult
    if rem == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return jnp.pad(x, pad)


def _scores_pallas(wq: jnp.ndarray, uh: jnp.ndarray, v: jnp.ndarray,
                   interpret: bool = False) -> jnp.ndarray:
    b, t, h = wq.shape
    _, l, _ = uh.shape
    wq_p = _pad_to(wq, 1, T_TILE)
    uh_p = _pad_to(uh, 1, L_TILE)
    tp, lp = wq_p.shape[1], uh_p.shape[1]
    grid = (b, tp // T_TILE, lp // L_TILE)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b, tp, lp), wq.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, T_TILE, h), lambda bi, ti, li: (bi, ti, 0)),
            pl.BlockSpec((1, L_TILE, h), lambda bi, ti, li: (bi, li, 0)),
            pl.BlockSpec((1, h), lambda bi, ti, li: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, T_TILE, L_TILE),
                               lambda bi, ti, li: (bi, ti, li)),
        interpret=interpret,
    )(wq_p, uh_p, v.reshape(1, h))
    return out[:, :t, :l]


def _scores_xla(wq, uh, v):
    return jnp.einsum("btlh,h->btl",
                      jnp.tanh(wq[:, :, None, :] + uh[:, None, :, :]), v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def additive_scores(wq: jnp.ndarray, uh: jnp.ndarray, v: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """wq: [B, T, H]; uh: [B, L, H]; v: [H] -> scores [B, T, L]."""
    if not HAVE_PALLAS:
        return _scores_xla(wq, uh, v)
    return _scores_pallas(wq, uh, v, interpret)


def _fwd(wq, uh, v, interpret):
    return additive_scores(wq, uh, v, interpret), (wq, uh, v)


def _bwd(interpret, res, g):
    wq, uh, v = res
    # NOTE: this backward re-materializes the [B, T, L, H] broadcast in XLA —
    # it exists for correctness, not memory savings; a fused Pallas VJP is
    # future work (TODO.md). The forward kernel's saving applies to
    # inference-only uses.
    t3 = jnp.tanh(wq[:, :, None, :] + uh[:, None, :, :])
    sech2 = (1.0 - t3 * t3)
    common = g[..., None] * sech2 * v  # [B, T, L, H]
    dwq = jnp.sum(common, axis=2)
    duh = jnp.sum(common, axis=1)
    dv = jnp.einsum("btlh,btl->h", t3, g)
    return dwq, duh, dv


additive_scores.defvjp(_fwd, _bwd)

"""Pallas TPU kernel: fused multi-head attention over merged-head layout.

The CaSE/Masque encode+rank path runs ~8-11 self-attention sites per
predict batch over [R, L, E] activations (R up to 640 rows, L<=100,
E=256 or 1280, H=8). XLA materializes each site's f32 [R, H, L, L] score
tensor in HBM (205 MB at passage scale) and then layout-converts it
around the softmax — xprof shows ~22 ms/batch (~19%) of the CaSE predict
program is exactly these copies (docs/PERF.md round 4; the score tensors
themselves add several hundred MB/layer of HBM traffic on top).

This kernel keeps scores and probabilities in VMEM only: one grid program
attends a block of rows end-to-end (QK^T -> mask -> softmax -> PV), so the
only HBM traffic is the projected q/k/v in and the context out.

Head handling without reshapes/transposes: for head ``h`` the kernel
masks k (and v) to that head's lane slice and contracts the FULL merged E
axis. The masked-out lanes contribute exact +0.0 products, and adding
0.0 to an f32 accumulator is exact, so each score equals the d-lane
contraction bit-for-bit — the same argument by which XLA's own d=32
MXU dots (zero-padded to 128 lanes) are exact. Likewise the PV product
masks v on its *output* lanes, leaving the per-lane contraction length
unchanged. Measured numerics (tools/exp_fused_encoder_attention.py, TPU
v5e, serving shapes): bf16 outputs differ from the einsum path by at
most 1 ULP (max|diff| 0.004 at |out|max ~2.5 — the VPU softmax reduces
in a different order than XLA's layout); f32 interpret-mode matches XLA
to 2e-6. The bf16 toy-corpus gate (docs/PERF.md round 5) checks the
metric effect before this is allowed on by default.

Replaces: the einsum path of ``ops/attention.attend`` (ref:
common/TransformerEncoder.py:42 / nn.MultiheadAttention's fused CUDA
kernels) for deterministic, no-bias, no-weights call sites.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

from ..ops.masking import neg_inf

# Per-program VMEM budget for the q/k/v input blocks (bytes). Small enough
# to leave room for the f32 score block and double buffering in ~16 MB.
_VMEM_INPUT_BUDGET = 3 * 1024 * 1024


def _rows_per_block(rows: int, lq: int, lk: int, e: int, itemsize: int) -> int:
    per_row = (lq + 2 * lk) * e * itemsize + 4 * lq * lk  # q/k/v + f32 scores
    rb = max(1, _VMEM_INPUT_BUDGET // max(per_row, 1))
    rb = min(rb, rows, 8)
    while rows % rb:
        rb -= 1
    return rb


def _kernel(q_ref, k_ref, v_ref, keep_ref, out_ref, *, num_heads: int,
            scale):
    q = q_ref[...]                       # [rb, Lq, E]
    k = k_ref[...]                       # [rb, Lk, E]
    v = v_ref[...]
    keep = keep_ref[:, 0, :]             # [rb, Lk] f32, 1.0 = attend
    rb, lq, e = q.shape
    d = e // num_heads
    qs = q * jnp.asarray(scale, q.dtype)
    # head id of each lane of the merged E axis
    lane_head = jax.lax.broadcasted_iota(jnp.int32, (1, 1, e), 2) // d
    key_valid = keep[:, None, :] > 0.5   # [rb, 1, Lk]
    big_neg = neg_inf(jnp.float32)
    # rows whose keys are ALL padding produce zero context (attend():90-91)
    any_valid = (jnp.max(keep, axis=1) > 0.5).astype(jnp.float32)  # [rb]
    acc = jnp.zeros((rb, lq, e), jnp.float32)
    batch_contract = lambda a, b, ca, cb: jax.lax.dot_general(
        a, b, (((ca,), (cb,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    for h in range(num_heads):
        hm = lane_head == h
        kh = jnp.where(hm, k, jnp.zeros((), k.dtype))
        s = batch_contract(qs, kh, 2, 2)              # [rb, Lq, Lk] f32
        s = jnp.where(key_valid, s, big_neg)
        p = jax.nn.softmax(s, axis=-1)
        vh = jnp.where(hm, v, jnp.zeros((), v.dtype))
        # p is cast to the value dtype exactly as attend() does before the
        # PV einsum; the f32 accumulation + single final cast matches the
        # einsum's internal f32 accumulator + bf16 output rounding.
        acc = acc + batch_contract(p.astype(v.dtype), vh, 2, 1)
    acc = acc * any_valid[:, None, None]
    out_ref[...] = acc.astype(out_ref.dtype)


def _fused_core(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                keepf: jnp.ndarray, num_heads: int,
                interpret: bool) -> jnp.ndarray:
    """Kernel dispatch (single-device view; keepf [R, 1, Lk] f32)."""
    r, lq, e = q.shape
    lk = k.shape[1]
    d = e // num_heads
    scale = np.float32(1.0) / np.sqrt(np.float32(d))
    rb = _rows_per_block(r, lq, lk, e, np.dtype(q.dtype).itemsize)
    grid = (r // rb,)
    kern = functools.partial(_kernel, num_heads=num_heads, scale=scale)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((r, lq, e), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rb, lq, e), lambda i: (i, 0, 0)),
            pl.BlockSpec((rb, lk, e), lambda i: (i, 0, 0)),
            pl.BlockSpec((rb, lk, e), lambda i: (i, 0, 0)),
            pl.BlockSpec((rb, 1, lk), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((rb, lq, e), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(q, k, v, keepf)


# --- SPMD partitioning: rows-parallel (shared scaffolding, kernels/spmd.py)

if HAVE_PALLAS:
    from .spmd import batch_partitioned
    # only the rows factor is shared — every L/E axis stays whole per
    # shard (the partition callback forces them replicated)
    _fused_cp = batch_partitioned(
        _fused_core, static_argnums=(4, 5),
        sharding_rule="r a b, r c d, r f g, r s m -> r x y")
else:  # pragma: no cover
    _fused_cp = _fused_core


# test hook: route the kernel through the Pallas interpreter so full
# model/predict programs can exercise the fused path on CPU (see
# kernels/copy_argmax.py for the same pattern; ops/attention's gate
# accepts non-TPU backends while this is set)
_FORCE_INTERPRET = False


@functools.partial(jax.jit, static_argnums=(4, 5))
def fused_mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              keep: jnp.ndarray | None, num_heads: int,
              interpret: bool | None = None) -> jnp.ndarray:
    """Fused attention on merged-head [R, L, E] projections.

    q: [R, Lq, E]; k/v: [R, Lk, E] (all already in-projected); keep:
    [R, Lk] bool (True = attend) or None. Returns the pre-out-projection
    context [R, Lq, E] in q's dtype. Deterministic (no dropout), no
    additive bias, no attention-weight output — the encoder/tower
    self-attention contract. Rows-dim SPMD-partitionable (each shard
    runs the plain single-device kernel on its local rows).
    """
    if interpret is None:
        interpret = _FORCE_INTERPRET
    r, lq, e = q.shape
    lk = k.shape[1]
    # [R, 1, Lk]: the singleton axis keeps the block's last-two dims equal
    # to the array dims (Mosaic tiling rule) for any rows-per-block
    if keep is None:
        keepf = jnp.ones((r, 1, lk), jnp.float32)
    else:
        keepf = keep.astype(jnp.float32)[:, None, :]
    return _fused_cp(q, k, v, keepf, num_heads, interpret)


def fused_mha_xla(q, k, v, keep, num_heads):
    """Reference formulation: the exact ops ``attend()`` runs (split heads,
    einsum scores, masked softmax, einsum PV, merge heads)."""
    r, lq, e = q.shape
    h = num_heads
    d = e // h
    scale = jnp.asarray(1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32)), q.dtype)
    qh = (q * scale).reshape(r, lq, h, d).transpose(0, 2, 1, 3)
    kh = k.reshape(r, -1, h, d).transpose(0, 2, 1, 3)
    vh = v.reshape(r, -1, h, d).transpose(0, 2, 1, 3)
    scores = jnp.einsum("rhqd,rhkd->rhqk", qh, kh,
                        preferred_element_type=jnp.float32)
    if keep is not None:
        scores = jnp.where(keep[:, None, None, :], scores,
                           neg_inf(scores.dtype))
    probs = jax.nn.softmax(scores, axis=-1)
    if keep is not None:
        any_valid = jnp.any(keep, axis=-1)[:, None, None, None]
        probs = jnp.where(any_valid, probs, jnp.zeros((), probs.dtype))
    ctx = jnp.einsum("rhqk,rhkd->rqhd", probs.astype(v.dtype), vh)
    return ctx.reshape(r, lq, e)

"""Pallas TPU kernels: fused TRAINING attention (forward + backward).

Round-13's op-by-op attribution (docs/PERF.md; tools/exp_train_copyops)
pinned ~25-30 ms of the 252 ms CaSE train step on the encoder/tower
self-attention sites: XLA materializes each site's [R, H, L, L] score and
prob tensors in HBM, layout-converts them around the softmax, stores the
probs for the backward pass, and runs the per-head [100 x d] dots at poor
MXU occupancy. The inference-only round-5 kernel
(kernels/encoder_attention.py) already keeps scores in VMEM but defines
no VJP and no dropout, so training could not use it.

This module is the training counterpart:

* ``_fwd_kernel`` — the round-5 merged-head attention body plus prob
  DROPOUT: the caller passes the bernoulli mask ([R, H, Lq, Lk] bf16
  0/1, generated in XLA from the SAME ``make_rng("dropout")`` key and
  shape the plain path uses, so the mask stream is identical to
  ``nn.Dropout``'s); probs never reach HBM.
* ``_bwd_kernel`` — flash-style backward WITHOUT online softmax: L<=100
  fits whole in VMEM, so each row-block recomputes scores+probs from
  q/k/v in VMEM and produces dq/dk/dv in one pass. Residuals of the
  custom_vjp are just (q, k, v, keep, mask) — no stored probs.

Head handling is the round-5 lane-mask trick (contract the FULL merged-E
axis with off-head lanes zeroed; +0.0 into an f32 accumulator is exact),
so no head reshapes/transposes touch HBM in either direction.

Numerics: forward equals the einsum+dropout path up to the VPU softmax
reduction order (<=1 bf16 ULP — same bound as the inference kernel);
backward is the exact analytic gradient of the kernel's own forward
(f32 interpret mode matches jax.grad of the XLA path to ~1e-5,
tests/test_kernels.py). Default: AUTO-ON for ``--bf16_train`` (the gate
in cli/run.py — the flip was smoke-gated by an 8-epoch bf16 train with
identical final metrics, docs/PERF.md round 13); f32 remains the parity
dtype and its training path never takes this kernel. Override either
way with ``--fused_train_attn`` / ``--no-fused_train_attn``.

Replaces (for training): the stored-probs attention autodiff of
``ops/attention.attend`` (ref: common/TransformerEncoder.py:42's
nn.MultiheadAttention under torch autograd).
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

# VMEM budgets (bytes). The backward holds q/k/v/do blocks + three f32
# accumulators + per-head [rb, Lq, Lk] temps; keep the input budget small
# enough that rb lands at 2-8 for E in {256, 1280}, L = 100.
_FWD_INPUT_BUDGET = 3 * 1024 * 1024
_BWD_INPUT_BUDGET = 2 * 1024 * 1024


def _pick_rb(rows: int, per_row: int, budget: int, cap: int = 8) -> int:
    rb = max(1, budget // max(per_row, 1))
    rb = min(rb, rows, cap)
    while rows % rb:
        rb -= 1
    return rb


def _fwd_kernel(q_ref, k_ref, v_ref, keep_ref, mask_ref, out_ref, *,
                num_heads: int, scale, inv_keep):
    q = q_ref[...]                       # [rb, Lq, E]
    k = k_ref[...]                       # [rb, Lk, E]
    v = v_ref[...]
    keep = keep_ref[:, 0, :]             # [rb, Lk] f32, 1.0 = attend
    rb, lq, e = q.shape
    d = e // num_heads
    qs = q * jnp.asarray(scale, q.dtype)
    lane_head = jax.lax.broadcasted_iota(jnp.int32, (1, 1, e), 2) // d
    key_valid = keep[:, None, :] > 0.5
    big_neg = neg_inf(jnp.float32)
    any_valid = (jnp.max(keep, axis=1) > 0.5).astype(jnp.float32)
    acc = jnp.zeros((rb, lq, e), jnp.float32)
    bc = lambda a, b, ca, cb: jax.lax.dot_general(
        a, b, (((ca,), (cb,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    for h in range(num_heads):
        hm = lane_head == h
        kh = jnp.where(hm, k, jnp.zeros((), k.dtype))
        s = bc(qs, kh, 2, 2)
        s = jnp.where(key_valid, s, big_neg)
        p = jax.nn.softmax(s, axis=-1)
        # prob dropout: the mask is the caller's bernoulli draw (same key
        # + shape as nn.Dropout on this site), applied with the flax
        # formula select(mask, p/keep_prob, 0). The mask block is 3-D
        # [rb, H*Lq, Lk] (Mosaic: no minor-dim games on sub-32-bit 4-D
        # refs) and bf16 compares go through f32 (no bf16 cmpf on this
        # target).
        m = mask_ref[:, h * lq:(h + 1) * lq, :].astype(jnp.float32) > 0.5
        p = jnp.where(m, p * jnp.asarray(inv_keep, p.dtype),
                      jnp.zeros((), p.dtype))
        vh = jnp.where(hm, v, jnp.zeros((), v.dtype))
        acc = acc + bc(p.astype(v.dtype), vh, 2, 1)
    acc = acc * any_valid[:, None, None]
    out_ref[...] = acc.astype(out_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, keep_ref, mask_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, num_heads: int, scale,
                inv_keep):
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    do = do_ref[...]                     # [rb, Lq, E]
    keep = keep_ref[:, 0, :]
    rb, lq, e = q.shape
    d = e // num_heads
    qs = q * jnp.asarray(scale, q.dtype)
    lane_head = jax.lax.broadcasted_iota(jnp.int32, (1, 1, e), 2) // d
    key_valid = keep[:, None, :] > 0.5
    big_neg = neg_inf(jnp.float32)
    # fwd zeroed all-padding rows (ctx *= any_valid), so every grad of
    # such a row is 0. Apply it to the f32 OUTPUT accumulators below —
    # broadcasting a bf16 vector into minor dims is a Mosaic crash
    # surface on this target ("insertion of minor dim ... only supported
    # for 32-bit types"), f32 is fine.
    any_valid = (jnp.max(keep, axis=1) > 0.5).astype(jnp.float32)
    dq = jnp.zeros((rb, lq, e), jnp.float32)
    dk = jnp.zeros((rb, k.shape[1], e), jnp.float32)
    dv = jnp.zeros((rb, k.shape[1], e), jnp.float32)
    bc = lambda a, b, ca, cb: jax.lax.dot_general(
        a, b, (((ca,), (cb,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    ik = jnp.asarray(inv_keep, jnp.float32)
    for h in range(num_heads):
        hm = lane_head == h
        kh = jnp.where(hm, k, jnp.zeros((), k.dtype))
        s = bc(qs, kh, 2, 2)
        s = jnp.where(key_valid, s, big_neg)
        p = jax.nn.softmax(s, axis=-1)                 # [rb, Lq, Lk] f32
        m = mask_ref[:, h * lq:(h + 1) * lq, :].astype(jnp.float32) > 0.5
        pt = jnp.where(m, p * ik, jnp.zeros((), p.dtype))  # dropped probs
        doh = jnp.where(hm, do, jnp.zeros((), do.dtype))
        # dV — ctx_h = cast(pt) @ vh: contract Lq between pt^T and doh
        dv = dv + jax.lax.dot_general(
            pt.astype(do.dtype), doh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        # d(pt) = doh @ vh^T (contract E; off-head lanes give exact 0)
        vh = jnp.where(hm, v, jnp.zeros((), v.dtype))
        dpt = bc(doh, vh, 2, 2)                        # [rb, Lq, Lk] f32
        dp = jnp.where(m, dpt * ik, jnp.zeros((), dpt.dtype))
        # softmax backward: ds = p * (dp - rowsum(dp * p))
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds = ds.astype(q.dtype)
        # dq_h = ds @ kh (contract Lk; kh is lane-masked -> h lanes only)
        dq = dq + bc(ds, kh, 2, 1)
        # dk_h = ds^T @ qs_h (contract Lq; qs lane-masked on the output e)
        qsh = jnp.where(hm, qs, jnp.zeros((), qs.dtype))
        dk = dk + jax.lax.dot_general(
            ds, qsh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    # dq contracted against the UNscaled kh, so the qs = q*scale chain
    # rule lands here; dk already used the scaled qs (qsh) — no factor.
    av = any_valid[:, None, None]
    dq_ref[...] = (dq * jnp.asarray(scale, jnp.float32) * av).astype(
        dq_ref.dtype)
    dk_ref[...] = (dk * av).astype(dk_ref.dtype)
    dv_ref[...] = (dv * av).astype(dv_ref.dtype)


def _fwd_core(q, k, v, keepf, mask, num_heads: int, rate: float,
              interpret: bool):
    r, lq, e = q.shape
    lk = k.shape[1]
    d = e // num_heads
    scale = np.float32(1.0) / np.sqrt(np.float32(d))
    it = np.dtype(q.dtype).itemsize
    per_row = (lq + 2 * lk) * e * it + 4 * lq * lk \
        + num_heads * lq * lk * np.dtype(mask.dtype).itemsize
    rb = _pick_rb(r, per_row, _FWD_INPUT_BUDGET)
    kern = functools.partial(_fwd_kernel, num_heads=num_heads, scale=scale,
                             inv_keep=np.float32(1.0 / (1.0 - rate)))
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((r, lq, e), q.dtype),
        grid=(r // rb,),
        in_specs=[
            pl.BlockSpec((rb, lq, e), lambda i: (i, 0, 0)),
            pl.BlockSpec((rb, lk, e), lambda i: (i, 0, 0)),
            pl.BlockSpec((rb, lk, e), lambda i: (i, 0, 0)),
            pl.BlockSpec((rb, 1, lk), lambda i: (i, 0, 0)),
            pl.BlockSpec((rb, num_heads * lq, lk), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((rb, lq, e), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(q, k, v, keepf, mask.reshape(r, num_heads * lq, lk))


def _bwd_core(q, k, v, keepf, mask, do, num_heads: int, rate: float,
              interpret: bool):
    """Returns one concatenated [R, Lq + 2*Lk, E] array (dq | dk | dv)
    so the SPMD rule stays single-result — works for Lq != Lk too (the
    teacher-forced decoder cross-attention)."""
    r, lq, e = q.shape
    lk = k.shape[1]
    d = e // num_heads
    scale = np.float32(1.0) / np.sqrt(np.float32(d))
    it = np.dtype(q.dtype).itemsize
    per_row = ((lq + 2 * lk) * e * it          # q/k/v in
               + lq * e * it                   # do in
               + 3 * lk * e * 4                # f32 accumulators
               + 3 * 4 * lq * lk               # s/p/dp temps
               + num_heads * lq * lk * np.dtype(mask.dtype).itemsize)
    rb = _pick_rb(r, per_row, _BWD_INPUT_BUDGET, cap=8)
    kern = functools.partial(_bwd_kernel, num_heads=num_heads, scale=scale,
                             inv_keep=np.float32(1.0 / (1.0 - rate)))
    dq, dk, dv = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((r, lq, e), q.dtype),
                   jax.ShapeDtypeStruct((r, lk, e), q.dtype),
                   jax.ShapeDtypeStruct((r, lk, e), q.dtype)],
        grid=(r // rb,),
        in_specs=[
            pl.BlockSpec((rb, lq, e), lambda i: (i, 0, 0)),
            pl.BlockSpec((rb, lk, e), lambda i: (i, 0, 0)),
            pl.BlockSpec((rb, lk, e), lambda i: (i, 0, 0)),
            pl.BlockSpec((rb, 1, lk), lambda i: (i, 0, 0)),
            pl.BlockSpec((rb, num_heads * lq, lk), lambda i: (i, 0, 0)),
            pl.BlockSpec((rb, lq, e), lambda i: (i, 0, 0)),
        ],
        out_specs=[pl.BlockSpec((rb, lq, e), lambda i: (i, 0, 0)),
                   pl.BlockSpec((rb, lk, e), lambda i: (i, 0, 0)),
                   pl.BlockSpec((rb, lk, e), lambda i: (i, 0, 0))],
        interpret=interpret,
    )(q, k, v, keepf, mask.reshape(r, num_heads * lq, lk), do)
    return jnp.concatenate([dq, dk, dv], axis=1)


if HAVE_PALLAS:
    from .spmd import batch_partitioned
    _fwd_cp = batch_partitioned(
        _fwd_core, static_argnums=(5, 6, 7),
        sharding_rule="r a b, r c d, r f g, r s m, r h i j -> r x y")
    _bwd_cp = batch_partitioned(
        _bwd_core, static_argnums=(6, 7, 8),
        sharding_rule="r a b, r c d, r f g, r s m, r h i j, r o p -> "
                      "r t y")
else:  # pragma: no cover
    _fwd_cp = _fwd_core
    _bwd_cp = _bwd_core


_FORCE_INTERPRET = False   # test hook, as in encoder_attention


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_train_mha(q, k, v, keepf, mask, num_heads: int, rate: float,
                    interpret: bool = False):
    """Fused attention with prob dropout, differentiable.

    q: [R, Lq, E]; k/v: [R, Lk, E] (in-projected, merged heads);
    keepf: [R, 1, Lk] f32 (1.0 = attend); mask: [R, H, Lq, Lk] bf16 0/1
    bernoulli keep-mask (caller-drawn — identical stream to nn.Dropout);
    rate: dropout rate (static). Returns the pre-out-projection context
    [R, Lq, E]. Rows-dim SPMD-partitionable.
    """
    return _fwd_cp(q, k, v, keepf, mask, num_heads, rate,
                   interpret or _FORCE_INTERPRET)


def _vjp_fwd(q, k, v, keepf, mask, num_heads, rate, interpret):
    ctx = _fwd_cp(q, k, v, keepf, mask, num_heads, rate,
                  interpret or _FORCE_INTERPRET)
    return ctx, (q, k, v, keepf, mask)


def _vjp_bwd(num_heads, rate, interpret, res, do):
    q, k, v, keepf, mask = res
    lq, lk = q.shape[1], k.shape[1]
    g = _bwd_cp(q, k, v, keepf, mask, do.astype(q.dtype), num_heads, rate,
                interpret or _FORCE_INTERPRET)
    return (g[:, :lq], g[:, lq:lq + lk], g[:, lq + lk:], None, None)


fused_train_mha.defvjp(_vjp_fwd, _vjp_bwd)


def fused_train_mha_xla(q, k, v, keep, mask, num_heads: int, rate: float):
    """Reference: the exact XLA ops the plain training path runs (attend
    + flax-formula prob dropout with the same mask)."""
    from .encoder_attention import fused_mha_xla  # noqa: F401 (doc link)
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
    probs = jnp.where(mask > 0.5, probs / (1.0 - rate), 0.0)
    ctx = jnp.einsum("rhqk,rhkd->rqhd", probs.astype(v.dtype), vh)
    return ctx.reshape(r, lq, e)


# ---------------------------------------------------------------------------
# In-kernel RNG variant: the dropout mask never exists outside the kernel.
#
# Round-15 attribution (tools/exp_train_sections.py, docs/PERF.md): even
# with the rbg generator the caller-drawn [R, H, Lq, Lk] masks cost
# ~18.7 ms/step of generation fusions plus ~1.5 GB/step of HBM mask
# traffic touched three times (gen write, fwd read, bwd residual read) —
# on a step measured at 75% of the v5e HBM peak, i.e. removable traffic
# is the only win left. Here the mask is drawn INSIDE the kernel with
# the Mosaic per-core PRNG (pltpu.prng_seed / prng_random_bits) and
# REGENERATED in the backward from the same seeds, so the custom_vjp
# residuals are just (q, k, v, keepf, rng_meta[R,3] int32).
#
# Determinism contract: the mask bits for (block of rows starting at
# global row0, head h) come from prng_seed(s0 ^ row0*MIX0,
# s1 ^ (h*MIX1 + row0)) followed by one [rb, Lq, Lk] draw. fwd and bwd
# therefore MUST tile rows identically — both cores use _shared_rb().
# rng_meta rows carry (seed0, seed1, global_row_index): under the rows-
# SPMD rule each shard's slice keeps its GLOBAL row ids, so shards draw
# disjoint streams with no extra plumbing. Mosaic constraints probed on
# this target: prng_seed accepts at most 2 words (hence the fold), and
# uint32 compare-to-constant works (no uint32->float casts).
#
# The stream deliberately differs from nn.Dropout's (that was the
# caller-mask variant's parity hook); the gate below ships OPT-IN until
# the metric-equivalence smoke passes, mirroring how bf16 scores and the
# caller-mask kernel were flipped (docs/PERF.md rounds 13/15).
# ---------------------------------------------------------------------------

_MIX0 = np.int32(-1640531527)    # 0x9E3779B9 (golden-ratio Weyl constant)
_MIX1 = np.int32(-2048144789)    # 0x85EBCA6B (murmur3 c2)


def _shared_rb(r, lq, lk, e, itemsize, num_heads):
    """One rb for fwd AND bwd (the mask-regeneration contract): the
    backward's budget is the binding one; include the uint32 bits +
    f32 mask temps the PRNG draw adds."""
    per_row = ((lq + 2 * lk) * e * itemsize    # q/k/v in
               + lq * e * itemsize             # do in
               + 3 * lk * e * 4                # f32 accumulators
               + 3 * 4 * lq * lk               # s/p/dp temps
               + 2 * 4 * lq * lk)              # prng bits + mask temp
    return _pick_rb(r, per_row, _BWD_INPUT_BUDGET, cap=8)


def _draw_keep(rng_ref, h, rb, lq, lk, thresh):
    """[rb, Lq, Lk] bool keep-mask for head h of this row block."""
    s0 = rng_ref[0, 0, 0]
    s1 = rng_ref[0, 0, 1]
    row0 = rng_ref[0, 0, 2]
    pltpu.prng_seed(s0 ^ (row0 * _MIX0),
                    s1 ^ (jnp.int32(h) * _MIX1 + row0))
    bits = pltpu.bitcast(pltpu.prng_random_bits((rb, lq, lk)), jnp.uint32)
    return bits < thresh


def _fwd_kernel_rng(q_ref, k_ref, v_ref, keep_ref, rng_ref, out_ref, *,
                    num_heads: int, scale, inv_keep, thresh):
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    keep = keep_ref[:, 0, :]
    rb, lq, e = q.shape
    lk = k.shape[1]
    d = e // num_heads
    qs = q * jnp.asarray(scale, q.dtype)
    lane_head = jax.lax.broadcasted_iota(jnp.int32, (1, 1, e), 2) // d
    key_valid = keep[:, None, :] > 0.5
    big_neg = neg_inf(jnp.float32)
    any_valid = (jnp.max(keep, axis=1) > 0.5).astype(jnp.float32)
    acc = jnp.zeros((rb, lq, e), jnp.float32)
    bc = lambda a, b, ca, cb: jax.lax.dot_general(
        a, b, (((ca,), (cb,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    for h in range(num_heads):
        hm = lane_head == h
        kh = jnp.where(hm, k, jnp.zeros((), k.dtype))
        s = bc(qs, kh, 2, 2)
        s = jnp.where(key_valid, s, big_neg)
        p = jax.nn.softmax(s, axis=-1)
        m = _draw_keep(rng_ref, h, rb, lq, lk, thresh)
        p = jnp.where(m, p * jnp.asarray(inv_keep, p.dtype),
                      jnp.zeros((), p.dtype))
        vh = jnp.where(hm, v, jnp.zeros((), v.dtype))
        acc = acc + bc(p.astype(v.dtype), vh, 2, 1)
    acc = acc * any_valid[:, None, None]
    out_ref[...] = acc.astype(out_ref.dtype)


def _bwd_kernel_rng(q_ref, k_ref, v_ref, keep_ref, rng_ref, do_ref,
                    dq_ref, dk_ref, dv_ref, *, num_heads: int, scale,
                    inv_keep, thresh):
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    do = do_ref[...]
    keep = keep_ref[:, 0, :]
    rb, lq, e = q.shape
    lk = k.shape[1]
    d = e // num_heads
    qs = q * jnp.asarray(scale, q.dtype)
    lane_head = jax.lax.broadcasted_iota(jnp.int32, (1, 1, e), 2) // d
    key_valid = keep[:, None, :] > 0.5
    big_neg = neg_inf(jnp.float32)
    any_valid = (jnp.max(keep, axis=1) > 0.5).astype(jnp.float32)
    dq = jnp.zeros((rb, lq, e), jnp.float32)
    dk = jnp.zeros((rb, lk, e), jnp.float32)
    dv = jnp.zeros((rb, lk, e), jnp.float32)
    bc = lambda a, b, ca, cb: jax.lax.dot_general(
        a, b, (((ca,), (cb,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    ik = jnp.asarray(inv_keep, jnp.float32)
    for h in range(num_heads):
        hm = lane_head == h
        kh = jnp.where(hm, k, jnp.zeros((), k.dtype))
        s = bc(qs, kh, 2, 2)
        s = jnp.where(key_valid, s, big_neg)
        p = jax.nn.softmax(s, axis=-1)
        m = _draw_keep(rng_ref, h, rb, lq, lk, thresh)  # == fwd's draw
        pt = jnp.where(m, p * ik, jnp.zeros((), p.dtype))
        doh = jnp.where(hm, do, jnp.zeros((), do.dtype))
        dv = dv + jax.lax.dot_general(
            pt.astype(do.dtype), doh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        vh = jnp.where(hm, v, jnp.zeros((), v.dtype))
        dpt = bc(doh, vh, 2, 2)
        dp = jnp.where(m, dpt * ik, jnp.zeros((), dpt.dtype))
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds = ds.astype(q.dtype)
        dq = dq + bc(ds, kh, 2, 1)
        qsh = jnp.where(hm, qs, jnp.zeros((), qs.dtype))
        dk = dk + jax.lax.dot_general(
            ds, qsh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    av = any_valid[:, None, None]
    dq_ref[...] = (dq * jnp.asarray(scale, jnp.float32) * av).astype(
        dq_ref.dtype)
    dk_ref[...] = (dk * av).astype(dk_ref.dtype)
    dv_ref[...] = (dv * av).astype(dv_ref.dtype)


def _fwd_core_rng(q, k, v, keepf, rng_meta, num_heads: int, rate: float):
    r, lq, e = q.shape
    lk = k.shape[1]
    d = e // num_heads
    scale = np.float32(1.0) / np.sqrt(np.float32(d))
    it = np.dtype(q.dtype).itemsize
    rb = _shared_rb(r, lq, lk, e, it, num_heads)
    kern = functools.partial(
        _fwd_kernel_rng, num_heads=num_heads, scale=scale,
        inv_keep=np.float32(1.0 / (1.0 - rate)),
        thresh=np.uint32(round((1.0 - rate) * float(2**32))))
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((r, lq, e), q.dtype),
        grid=(r // rb,),
        in_specs=[
            pl.BlockSpec((rb, lq, e), lambda i: (i, 0, 0)),
            pl.BlockSpec((rb, lk, e), lambda i: (i, 0, 0)),
            pl.BlockSpec((rb, lk, e), lambda i: (i, 0, 0)),
            pl.BlockSpec((rb, 1, lk), lambda i: (i, 0, 0)),
            pl.BlockSpec((rb, 1, 128), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((rb, lq, e), lambda i: (i, 0, 0)),
    )(q, k, v, keepf, rng_meta)


def _bwd_core_rng(q, k, v, keepf, rng_meta, do, num_heads: int,
                  rate: float):
    """dq | dk | dv concatenated on axis 1 (single-result SPMD rule)."""
    r, lq, e = q.shape
    lk = k.shape[1]
    d = e // num_heads
    scale = np.float32(1.0) / np.sqrt(np.float32(d))
    it = np.dtype(q.dtype).itemsize
    rb = _shared_rb(r, lq, lk, e, it, num_heads)
    kern = functools.partial(
        _bwd_kernel_rng, num_heads=num_heads, scale=scale,
        inv_keep=np.float32(1.0 / (1.0 - rate)),
        thresh=np.uint32(round((1.0 - rate) * float(2**32))))
    dq, dk, dv = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((r, lq, e), q.dtype),
                   jax.ShapeDtypeStruct((r, lk, e), q.dtype),
                   jax.ShapeDtypeStruct((r, lk, e), q.dtype)],
        grid=(r // rb,),
        in_specs=[
            pl.BlockSpec((rb, lq, e), lambda i: (i, 0, 0)),
            pl.BlockSpec((rb, lk, e), lambda i: (i, 0, 0)),
            pl.BlockSpec((rb, lk, e), lambda i: (i, 0, 0)),
            pl.BlockSpec((rb, 1, lk), lambda i: (i, 0, 0)),
            pl.BlockSpec((rb, 1, 128), lambda i: (i, 0, 0)),
            pl.BlockSpec((rb, lq, e), lambda i: (i, 0, 0)),
        ],
        out_specs=[pl.BlockSpec((rb, lq, e), lambda i: (i, 0, 0)),
                   pl.BlockSpec((rb, lk, e), lambda i: (i, 0, 0)),
                   pl.BlockSpec((rb, lk, e), lambda i: (i, 0, 0))],
    )(q, k, v, keepf, rng_meta, do)
    return jnp.concatenate([dq, dk, dv], axis=1)


if HAVE_PALLAS:
    _fwd_rng_cp = batch_partitioned(
        _fwd_core_rng, static_argnums=(5, 6),
        sharding_rule="r a b, r c d, r f g, r s m, r n u -> r x y")
    _bwd_rng_cp = batch_partitioned(
        _bwd_core_rng, static_argnums=(6, 7),
        sharding_rule="r a b, r c d, r f g, r s m, r n u, r o p -> r t y")
else:  # pragma: no cover
    _fwd_rng_cp = _fwd_core_rng
    _bwd_rng_cp = _bwd_core_rng


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_train_mha_rng(q, k, v, keepf, rng_meta, num_heads: int,
                        rate: float):
    """Fused training attention with IN-KERNEL prob dropout.

    Same contract as :func:`fused_train_mha` except the mask argument is
    replaced by ``rng_meta`` [R, 1, 128] int32 rows of (seed0, seed1,
    global_row_index, zero padding); the bernoulli keep-mask is drawn inside the
    kernel and regenerated in the backward — no [R, H, Lq, Lk] tensor
    exists anywhere. No interpret mode (the Mosaic PRNG has no
    interpreter lowering on this image); gate on real-TPU only.
    """
    return _fwd_rng_cp(q, k, v, keepf, rng_meta, num_heads, rate)


def _vjp_rng_fwd(q, k, v, keepf, rng_meta, num_heads, rate):
    ctx = _fwd_rng_cp(q, k, v, keepf, rng_meta, num_heads, rate)
    return ctx, (q, k, v, keepf, rng_meta)


def _vjp_rng_bwd(num_heads, rate, res, do):
    q, k, v, keepf, rng_meta = res
    lq, lk = q.shape[1], k.shape[1]
    g = _bwd_rng_cp(q, k, v, keepf, rng_meta, do.astype(q.dtype),
                    num_heads, rate)
    return (g[:, :lq], g[:, lq:lq + lk], g[:, lq + lk:], None, None)


fused_train_mha_rng.defvjp(_vjp_rng_fwd, _vjp_rng_bwd)


def rng_meta_from_key(key, rows: int) -> jnp.ndarray:
    """[R, 1, 128] int32 rows of (seed0, seed1, global_row, 0 pad...).

    128-wide because Mosaic requires the (sublane, lane) tail of a block
    to be (multiple-of-8, multiple-of-128) or the whole array — a [R, 3]
    operand fails once the row-block is smaller than R. 512 B/row of
    padding is noise next to the q/k/v operands."""
    kd = jax.random.key_data(key).astype(jnp.uint32).reshape(-1)[:2]
    kd = kd.astype(jnp.int32)
    flat = jnp.concatenate(
        [jnp.broadcast_to(kd[None, :], (rows, 2)),
         jnp.arange(rows, dtype=jnp.int32)[:, None],
         jnp.zeros((rows, 125), jnp.int32)], axis=1)
    return flat[:, None, :]

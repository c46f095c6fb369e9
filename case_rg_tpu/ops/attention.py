"""Multi-head attention with packed QKV projection and KV-cache support.

TPU-native replacement for the reference's reliance on
``torch.nn.MultiheadAttention`` (ref: common/TransformerEncoder.py:42,
common/TransformerDecoder.py:45-46, common/TransformerBlock.py:11). Math is
identical: packed in-projection, per-head scaled dot-product, optional
additive attention mask plus boolean key-padding mask, dropout on the
attention probabilities, output projection, and (optionally) the
mean-over-heads probability matrix.

Everything is laid out for the MXU: a single [E, 3E] matmul for QKV, batched
einsums for scores/context, no per-head Python loops.
"""

from __future__ import annotations

from typing import Optional, Tuple

import functools

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from .masking import neg_inf

# --- attention-score precision switch (--bf16_scores) -----------------------
# f32 inputs (the parity dtype) ALWAYS get f32 scores. For bf16 inputs the
# default also accumulates scores to f32 (keeps the documented
# "bf16 inference is metric-identical" contract); opting in via
# set_bf16_scores(True) keeps the scores in bf16, which avoids materializing
# + layout-converting f32 [B,H,L,L] score tensors (xprof: ~19% of the CaSE
# predict batch) — measured +16% case / +13% masque serving qps, with
# generation metrics unchanged and only near-tie rank flips on the toy gate
# corpus (docs/PERF.md round 4).
_BF16_SCORES = False


def set_bf16_scores(on: bool) -> None:
    """Enable bf16 attention scores for bf16 inputs (process-wide; call
    before the first jit trace — the CLIs set it at startup)."""
    global _BF16_SCORES
    _BF16_SCORES = bool(on)


# --- scoped attention remat (experiment, round 13) --------------------------
# Recompute scores/probs in the backward pass instead of storing them
# (flash-attention's memory trick, scoped to the attend body only — the
# GLOBAL remat policies were refuted for speed in round 11). Probe lever
# for the train step's score-shaped HBM traffic; exp_train_bench --remat_attn.
_REMAT_ATTEND = False


def set_remat_attend(on: bool) -> None:
    global _REMAT_ATTEND
    _REMAT_ATTEND = bool(on)


# --- fused (Pallas) encoder attention ---------------------------------------
# For deterministic, no-bias, no-weights bf16 attention sites on TPU, the
# fused kernel in kernels/encoder_attention.py keeps the f32 [R,H,L,L]
# score tensor in VMEM instead of materializing + layout-converting it in
# HBM (xprof: ~19% of the CaSE predict batch; 2x faster per passage-tower
# site, +48% rank-only qps). Outputs differ from the einsum path by at
# most 1 bf16 ULP (softmax reduction order — see the kernel docstring);
# f32 (the parity dtype) never takes this path. Disable with
# set_fused_attention(False) / --no-fused_attn.
_FUSED_ATTN = True


def set_fused_attention(on: bool) -> None:
    """Enable/disable the Pallas fused attention path (process-wide; call
    before the first jit trace)."""
    global _FUSED_ATTN
    _FUSED_ATTN = bool(on)


# --- fused TRAINING attention (kernels/train_attention.py) ------------------
# Differentiable fwd+bwd fused attention with prob dropout for the
# encoder/tower self-attention sites — the round-13 attribution put
# ~25-30 ms/step of the CaSE train step on exactly their stored-probs
# autodiff + layout conversions. The bernoulli mask is drawn in XLA from
# the SAME make_rng key/shape as nn.Dropout (identical stream); residuals
# are (q, k, v, keep, mask) — probs never reach HBM in either direction.
# Default: cli/run.py AUTO-ENABLES this for --bf16_train (smoke-gated:
# 8-epoch bf16 train with/without was metric-identical, docs/PERF.md
# round 13); f32 (the parity dtype) keeps the XLA path. The module-level
# default here stays False so library users opt in explicitly.
_FUSED_TRAIN_ATTN = False


def set_fused_train_attention(on: bool) -> None:
    global _FUSED_TRAIN_ATTN
    _FUSED_TRAIN_ATTN = bool(on)


# In-kernel RNG for the fused training attention's prob dropout
# (kernels/train_attention.fused_train_mha_rng): the [R, H, Lq, Lk]
# bernoulli mask is drawn by the Mosaic per-core PRNG inside the kernel
# and regenerated in the backward — it never exists in HBM. Round-15
# sizing: the caller-drawn masks cost ~18.7 ms/step of generation ops
# plus ~1.5 GB/step of traffic touched three times on a step already at
# 75% of HBM peak (docs/PERF.md round 15). The dropout STREAM differs
# from nn.Dropout's (a different-but-valid bernoulli family); the demo-
# corpus smoke showed IDENTICAL ranking metrics and generation within
# overfit noise (docs/PERF.md round 15 — the same standard that gated
# the rbg default), so cli/run AUTO-ENABLES this for --bf16_train;
# --no-kernel_rng_dropout restores the nn.Dropout-stream masks. The
# module default stays False for library users. Requires a real TPU
# (the Mosaic PRNG has no interpreter lowering); silently falls back to
# the caller-mask kernel elsewhere.
_FUSED_TRAIN_ATTN_RNG = False


def set_fused_train_attn_rng(on: bool) -> None:
    global _FUSED_TRAIN_ATTN_RNG
    _FUSED_TRAIN_ATTN_RNG = bool(on)


# Head-batched [R*H, L, d] layout for fused-training-attention sites at
# least _HEADBATCH_MIN_E wide (the two 1280-wide block-0 tower sites):
# folds H into the kernel's rows axis, removing the lane-mask trick's
# H=8x redundant MXU work where it is MXU-visible. Microbench: fwd+bwd
# 10.69 -> 6.98 ms/call at E=1280 (transposes included), SLOWER at
# E=256 (VPU-bound) — docs/PERF.md round 15. Toggle for A/Bs.
_FUSED_TRAIN_HEADBATCH = True
_HEADBATCH_MIN_E = 1024


def set_fused_train_headbatch(on: bool) -> None:
    global _FUSED_TRAIN_HEADBATCH
    _FUSED_TRAIN_HEADBATCH = bool(on)


def _fused_train_attention_ok(attn_bias, need_weights, deterministic,
                              dropout) -> bool:
    if not _FUSED_TRAIN_ATTN or attn_bias is not None or need_weights:
        return False
    if deterministic or dropout <= 0.0:
        return False   # the deterministic path has its own kernel above
    try:
        from ..kernels import train_attention as ta
    except Exception:  # pragma: no cover
        return False
    if not ta.HAVE_PALLAS:
        return False
    if ta._FORCE_INTERPRET:
        return True
    return jax.default_backend() == "tpu"


def _fused_attention_ok(dtype, attn_bias, need_weights, deterministic,
                        dropout) -> bool:
    if not _FUSED_ATTN or attn_bias is not None or need_weights:
        return False
    if not deterministic:
        return False  # inference-only: pallas_call defines no VJP
    try:
        from ..kernels import encoder_attention as ea
    except Exception:  # pragma: no cover
        return False
    if not ea.HAVE_PALLAS:
        return False
    if ea._FORCE_INTERPRET:
        # test hook: run the kernel through the Pallas interpreter on any
        # backend/dtype so full-model CPU tests can exercise this path
        # (this CPU backend cannot even execute bf16 model programs —
        # XLA:CPU has no bf16 x bf16 -> f32 DotThunk)
        return True
    if dtype != jnp.bfloat16:
        return False  # f32 stays on the XLA path (the parity dtype)
    return jax.default_backend() == "tpu"


def _score_dtype(in_dtype):
    if in_dtype == jnp.float32 or not _BF16_SCORES:
        return jnp.float32
    return in_dtype


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, l, e = x.shape
    return x.reshape(b, l, num_heads, e // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, l, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)


def attend(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
           *, attn_bias: Optional[jnp.ndarray] = None,
           key_keep: Optional[jnp.ndarray] = None,
           dropout_rate: float = 0.0,
           deterministic: bool = True,
           dropout_rng: Optional[jax.Array] = None,
           need_weights: bool = False,
           blhd: bool = False,
           ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Scaled dot-product attention on [B, H, L, d] tensors — or, with
    ``blhd=True``, on [B, L, H, d] tensors (reshape-only head splits; the
    einsums carry H as a batch dimension). NOTE: blhd is NOT used by the
    model paths — it measured perf-neutral on the train step AND its dot
    tiling makes f32 results batch-size-dependent at the ~10-ulp level
    (docs/PERF.md round 13); it stays only as the measured-refutation
    artifact.

    ``attn_bias``: additive [Lq, Lk] (e.g. causal). ``key_keep``: boolean
    [B, Lk], True = attend. Rows whose keys are all masked produce zeros
    (torch would produce NaN; no model consumes such rows).

    Mixed precision: the score matmul accumulates in f32 by default (bf16
    MXU inputs, f32 softmax); ``set_bf16_scores(True)`` keeps bf16 scores
    for bf16 inputs (faster — see the module-level note), f32 inputs are
    always f32.
    """
    d = q.shape[-1]
    scale = jnp.asarray(1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32)), q.dtype)
    s_eq = "bqhd,bkhd->bhqk" if blhd else "bhqd,bhkd->bhqk"
    scores = jnp.einsum(s_eq, q * scale, k,
                        preferred_element_type=_score_dtype(q.dtype))
    if attn_bias is not None:
        scores = scores + attn_bias[None, None, :, :].astype(scores.dtype)
    if key_keep is not None:
        scores = jnp.where(key_keep[:, None, None, :], scores, neg_inf(scores.dtype))
    probs = jax.nn.softmax(scores, axis=-1)
    if key_keep is not None:
        any_valid = jnp.any(key_keep, axis=-1)[:, None, None, None]
        probs = jnp.where(any_valid, probs, jnp.zeros((), probs.dtype))
    weights = jnp.mean(probs, axis=1) if need_weights else None
    if dropout_rate > 0.0 and not deterministic:
        # the [rows, H, Lq, Lk] probs mask is the fattest dropout tensor
        # in the model — seeded mode regenerates it in backward instead
        # of storing it (ops/dropout.py; bitwise-equal either way)
        from .dropout import dropout_apply
        probs = dropout_apply(probs, dropout_rng, dropout_rate)
    o_eq = "bhqk,bkhd->bqhd" if blhd else "bhqk,bhkd->bhqd"
    out = jnp.einsum(o_eq, probs.astype(v.dtype), v)
    return out, weights


class MultiHeadAttention(nn.Module):
    """Torch-compatible MHA (same embed dim for q/k/v, packed projection)."""

    embed_dim: int
    num_heads: int
    dropout: float = 0.0

    def setup(self):
        e = self.embed_dim
        self.qkv_kernel = self.param(
            "qkv_kernel", nn.initializers.xavier_uniform(), (e, 3 * e))
        self.qkv_bias = self.param("qkv_bias", nn.initializers.zeros, (3 * e,))
        self.out = nn.Dense(e, use_bias=True, name="out",
                            kernel_init=nn.initializers.xavier_uniform())

    def _proj(self, x: jnp.ndarray, which: str) -> jnp.ndarray:
        e = self.embed_dim
        i = {"q": 0, "k": 1, "v": 2}[which]
        return x @ self.qkv_kernel[:, i * e:(i + 1) * e] + self.qkv_bias[i * e:(i + 1) * e]

    def project_q(self, x: jnp.ndarray) -> jnp.ndarray:
        return self._proj(x, "q")

    def project_kv(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Precompute K/V (merged-head layout [B, L, E]) for cached decoding."""
        return self._proj(x, "k"), self._proj(x, "v")

    def project_qkv(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """All three projections in ONE matmul (decode steps: 1 op instead
        of 3 — measured 14% faster on the 8-layer decode chain,
        tools/exp_decode_chain.py). Returns (q [B, L, E], kv [B, L, 2E]);
        the packed kv half is written to the cache as one buffer."""
        qkv = x @ self.qkv_kernel + self.qkv_bias
        e = self.embed_dim
        return qkv[..., :e], qkv[..., e:]

    def attend_with_kv_merged(self, q_in: jnp.ndarray, k: jnp.ndarray,
                              v: jnp.ndarray, *, key_keep=None,
                              q_projected: bool = False):
        """Single-query decode attention over merged-layout K/V [B, L, E]
        with reshape-only head handling (no transpose op): einsums contract
        the head axis in place, keeping the 128-wide minor dimension of the
        cache intact (head-split [B,H,L,32] storage measured slower —
        docs/PERF.md). ``q_projected=True`` skips the query projection
        (already done by ``project_qkv``)."""
        b, lq, e = q_in.shape
        h = self.num_heads
        d = e // h
        q = (q_in if q_projected else self.project_q(q_in)).reshape(b, lq, h, d)
        kh = k.reshape(b, -1, h, d)
        vh = v.reshape(b, -1, h, d)
        scale = jnp.asarray(1.0 / np.sqrt(d), q.dtype)
        if lq == 1 and q.dtype != jnp.float32:
            # Single-query scores as ONE batched MXU matmul instead of the
            # per-head matvec XLA strength-reduces to a VPU multiply+reduce
            # (which relayouts + upcasts the whole bf16 K cache to f32 per
            # step — xprof round 5; with the fused encoder kernel this is
            # case 554->737 qps). ``qbd`` places each head's scaled query
            # slice block-diagonally on the merged E axis; masked lanes
            # contribute exact +0.0 products, but the longer contraction
            # associates the 32 live terms differently, so scores can move
            # by 1 ULP — f32 (the parity dtype, and no upcast to save)
            # keeps the per-head einsum below bit-for-bit.
            qs = (q * scale)[:, 0]                       # [B, H, d]
            eye = jnp.eye(h, dtype=q.dtype)
            qbd = (qs[:, :, :, None] * eye[:, None, :]).reshape(b, e, h)
            s_lh = jnp.einsum("ble,beh->blh", k, qbd,
                              preferred_element_type=_score_dtype(q.dtype))
            scores = s_lh.transpose(0, 2, 1)[:, :, None, :]   # [B, H, 1, L]
        else:
            scores = jnp.einsum("bqhd,bkhd->bhqk", q * scale, kh,
                                preferred_element_type=_score_dtype(q.dtype))
        if key_keep is not None:
            scores = jnp.where(key_keep[:, None, None, :], scores,
                               neg_inf(scores.dtype))
        probs = jax.nn.softmax(scores, axis=-1)
        if key_keep is not None:
            any_valid = jnp.any(key_keep, axis=-1)[:, None, None, None]
            probs = jnp.where(any_valid, probs, jnp.zeros((), probs.dtype))
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(vh.dtype), vh)
        return self.out(ctx.reshape(b, lq, e)), None

    def attend_with_kv(self, q_in: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                       *, attn_bias=None, key_keep=None,
                       deterministic: bool = True,
                       need_weights: bool = False):
        """Attention where K/V are already projected ([B, Lk, E])."""
        if _fused_attention_ok(q_in.dtype, attn_bias, need_weights,
                               deterministic, self.dropout):
            from ..kernels.encoder_attention import fused_mha
            ctx = fused_mha(self.project_q(q_in), k, v, key_keep,
                            self.num_heads)
            return self.out(ctx), None
        if _fused_train_attention_ok(attn_bias, need_weights,
                                     deterministic, self.dropout):
            # covers every encoder/tower SELF-attention site (where the
            # round-13 attribution put the cost) AND the teacher-forced
            # decoder cross-attentions (Lq != Lk: the bwd kernel returns
            # dq|dk|dv concatenated on one axis for the single-result
            # SPMD rule). Biased sites (decoder causal self-attn) stay
            # on the XLA path.
            from ..kernels.train_attention import (fused_train_mha,
                                                   fused_train_mha_rng,
                                                   rng_meta_from_key)
            q = self.project_q(q_in)
            r, lq, e = q.shape
            lk = k.shape[1]
            h = self.num_heads
            rng = self.make_rng("dropout")
            # head-batched layout for the WIDE sites only (the two
            # block-0 towers, E=1280): fold H into the rows axis so each
            # row contracts its own d lanes instead of the lane-masked
            # full E (H=8x MXU redundancy). Microbenched fwd+bwd 10.69
            # -> 6.98 ms/call at E=1280 including these split/merge
            # transposes, but SLOWER at E=256 where the sites are
            # VPU-bound and the transposes are pure cost (docs/PERF.md
            # round 15) — hence the width gate.
            headbatch = _FUSED_TRAIN_HEADBATCH and e >= _HEADBATCH_MIN_E \
                and h > 1
            if headbatch:
                d = e // h
                q = (q.reshape(r, lq, h, d).transpose(0, 2, 1, 3)
                     .reshape(r * h, lq, d))
                k = (k.reshape(r, lk, h, d).transpose(0, 2, 1, 3)
                     .reshape(r * h, lk, d))
                v = (v.reshape(r, lk, h, d).transpose(0, 2, 1, 3)
                     .reshape(r * h, lk, d))
                key_keep_k = (None if key_keep is None else
                              jnp.repeat(key_keep, h, axis=0))
                rk, hk = r * h, 1
            else:
                key_keep_k, rk, hk = key_keep, r, h
            keepf = jnp.ones((rk, 1, lk), jnp.float32) \
                if key_keep_k is None \
                else key_keep_k.astype(jnp.float32)[:, None, :]
            from ..kernels import train_attention as _ta
            if _FUSED_TRAIN_ATTN_RNG and not _ta._FORCE_INTERPRET \
                    and jax.default_backend() == "tpu":
                # in-kernel PRNG: no mask tensor anywhere (see the
                # module note above; gate = real TPU only)
                ctx = fused_train_mha_rng(q, k, v, keepf,
                                          rng_meta_from_key(rng, rk),
                                          hk, float(self.dropout))
            else:
                # the SAME key + shape nn.Dropout would draw on this
                # site — the mask stream is identical to the plain
                # path's (under headbatch the draw keeps the [r,h,..]
                # shape, reshaped to rows — stream unchanged)
                mask = jax.random.bernoulli(
                    rng, 1.0 - self.dropout,
                    (r, self.num_heads, lq, lk)).astype(jnp.bfloat16)
                if headbatch:
                    mask = mask.reshape(rk, hk, lq, lk)
                ctx = fused_train_mha(q, k, v, keepf, mask, hk,
                                      float(self.dropout))
            if headbatch:
                d = e // h
                ctx = (ctx.reshape(r, h, lq, d).transpose(0, 2, 1, 3)
                       .reshape(r, lq, e))
            return self.out(ctx), None
        # NOTE on the blhd (reshape-only, transpose-free) formulation: it
        # was measured perf-NEUTRAL on the train step (XLA's layout
        # assignment materializes the same copies either way, docs/PERF.md
        # round 13) and REVERTED because its dot tiling makes f32 scores
        # batch-size-DEPENDENT at the ~10-ulp level (f32 matmuls run as
        # bf16x3 passes whose accumulation grouping follows the layout) —
        # the serving equality tests compare rank scores across batch
        # widths and rely on the split_heads formulation's stability.
        h = self.num_heads
        if _REMAT_ATTEND and not deterministic:
            # scoped attention remat probe (exp_train_bench --remat_attn;
            # measured WORSE — kept as the documented experiment hook)
            q = self.project_q(q_in)
            rng = self.make_rng("dropout") if self.dropout > 0.0 else None
            fn = jax.checkpoint(
                functools.partial(attend, dropout_rate=self.dropout,
                                  deterministic=False, dropout_rng=rng,
                                  need_weights=need_weights,
                                  attn_bias=attn_bias, key_keep=key_keep),
                policy=jax.checkpoint_policies.nothing_saveable)
            ctx, w = fn(split_heads(q, h), split_heads(k, h),
                        split_heads(v, h))
            return self.out(merge_heads(ctx)), w
        return self.attend_with_kv_heads(
            q_in, split_heads(k, h), split_heads(v, h), attn_bias=attn_bias,
            key_keep=key_keep, deterministic=deterministic,
            need_weights=need_weights)

    def attend_with_kv_heads(self, q_in: jnp.ndarray, k: jnp.ndarray,
                             v: jnp.ndarray, *, attn_bias=None, key_keep=None,
                             deterministic: bool = True,
                             need_weights: bool = False):
        """Attention with K/V already projected AND head-split [B, H, Lk, d]."""
        q = self.project_q(q_in)
        h = self.num_heads
        rng = self.make_rng("dropout") if (self.dropout > 0.0 and not deterministic) else None
        ctx, w = attend(split_heads(q, h), k, v,
                        attn_bias=attn_bias, key_keep=key_keep,
                        dropout_rate=self.dropout, deterministic=deterministic,
                        dropout_rng=rng, need_weights=need_weights)
        return self.out(merge_heads(ctx)), w

    def __call__(self, q_in: jnp.ndarray, k_in: jnp.ndarray, v_in: jnp.ndarray,
                 *, attn_bias=None, key_keep=None, deterministic: bool = True,
                 need_weights: bool = False):
        k = self._proj(k_in, "k")
        v = self._proj(v_in, "v")
        return self.attend_with_kv(q_in, k, v, attn_bias=attn_bias,
                                   key_keep=key_keep, deterministic=deterministic,
                                   need_weights=need_weights)

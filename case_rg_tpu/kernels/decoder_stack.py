"""Pallas TPU kernel: one fused decode step through a whole decoder stack.

The CaSE/Masque greedy decode runs 40 sequential steps, each dispatching
~60 small XLA ops across two 4-layer decoder stacks (self-attention over
the KV cache, cross-attention over the encoder memory, FFN — ref hot loop:
CaSE/Model.py:91-123, rebuilt in ops/transformer.DecoderLayer.step).
xprof shows the per-step layer chain is the decode limiter (~1.07 ms/step
of the ~1.5 ms step at B=64 — docs/PERF.md "decode step cost split"), and
its HBM traffic is dominated by re-streaming the four per-layer projected
cross K/V caches ([B, L, E] each, ~262 MB/step at B=64 L=1000).

This kernel runs ALL layers of one stack in a single Mosaic program and
replaces the per-layer K/V caches with the raw encoder memory, kept
resident in VMEM across layers:

* Folded cross projections. For head ``h`` the attention scores need
  ``(x W_q + b_q) . (m W_k + b_k)``; distributing gives four terms, two
  of which (``x W_q,h . b_k,h`` and ``b_q,h . b_k,h``) are constant
  along the memory axis L — the softmax axis — so softmax cancels them
  EXACTLY and the kernel never computes them (they also trip a Mosaic
  compile crash when combined with the score dot: the [rb, h] ->
  [rb, h, L] broadcast add SIGABRTs tpu_compile_helper on this
  toolchain — bisected 2026-08-19, docs/PERF.md). The two surviving
  terms are evaluated against the RAW memory ``m``::

      scores[h] = x A_h m^T + m u_h     (up to a softmax-invariant shift)
      A_h  = s * W_q,h W_k,h^T   (s = 1/sqrt(d_head))
      u_h  = s * W_k,h b_q,h

  and likewise the value/out projections collapse (using sum(p)=1)::

      out = sum_h (p_h m) (W_v,h W_o,h) + (b_v W_o + b_o)

  so the 4 layers' K/V caches (8 [B, L, E] buffers) are never built:
  one [B, L, E] memory read serves every layer. Exact in real
  arithmetic; in finite precision the folded operands are computed in
  f32 and the kernel's dots accumulate in f32, so outputs track the XLA
  chain to bf16 rounding (the equivalence gate is decoded-token
  identity, like the other shipped kernels — docs/PERF.md round 5/6).

* Self-attention uses the proven lane-masking pattern from
  kernels/encoder_attention.py (contract the full merged E axis with
  the off-head lanes zeroed — exact, no head reshapes).

* The KV-cache update is a vectorized select against an iota over T
  (same semantics as ops/cache.write_step: per-row ``t`` supported,
  out-of-range rows skip their write — continuous batching's done rows).

Layer weights ride as stacked [n_layers, ...] operands with constant
block index, so Mosaic keeps them (and nothing else but one [rb, L, E]
memory block) in VMEM for the whole grid.

Gate: bf16 + TPU only (f32 — the parity dtype — keeps the XLA chain);
auto-on is decided by measurement in models/multimem (docs/PERF.md).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

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

# test hook: run through the Pallas interpreter on any backend (same
# pattern as kernels/encoder_attention.py / copy_argmax.py)
_FORCE_INTERPRET = False

_LN_EPS = 1e-5

# Upper bound for one stack_step call's [B, lc, T, 2E] cache slice: XLA
# promotes it to scoped VMEM (16 MiB hard limit on v5e) when it is a
# while-loop carried custom-call output; 12 MiB leaves headroom for the
# co-resident [B, E] hidden output. stack_step shrinks layers_per_call
# until the slice fits (B=128 CaSE shapes stay at lc=2, B=256 drops to 1).
_VMEM_CACHE_BYTES = 12 * 2 ** 20

# Under the custom_partitioning batch rule each device holds only
# B/data_shards rows, but stack_step traces with the GLOBAL batch shape —
# the VMEM bound would over-shrink layers_per_call on multi-chip predict
# (perf-only conservatism). Callers that build a data-sharded predict mesh
# declare its data-axis size here (runtime/mesh.local_mesh does it); the
# default 1 keeps the single-device bound exact.
_DATA_SHARDS = 1


def set_data_shards(n: int) -> None:
    """Declare the data-axis shard count of subsequently traced programs."""
    global _DATA_SHARDS
    _DATA_SHARDS = max(1, int(n))


def fold_stack_weights(stack_params: Dict, num_layers: int, num_heads: int,
                       dtype=jnp.bfloat16) -> Dict[str, jnp.ndarray]:
    """Build the kernel's stacked folded operands from a ``ops.transformer.
    Decoder``'s params (``stack_params['layer{i}']``).

    All folds are computed in f32 and cast to ``dtype`` once. Returns a
    dict of [n_layers, ...] arrays (see kernel body for each shape).
    """
    h = num_heads

    def f32(x):
        return jnp.asarray(x, jnp.float32)

    out: Dict[str, list] = {k: [] for k in (
        "ln1g", "ln1b", "ln2g", "ln2b", "ln3g", "ln3b",
        "wqkv", "bqkv", "wos", "bos",
        "aq", "u", "wvo", "bout",
        "w1", "b1", "w2", "b2")}
    for i in range(num_layers):
        p = stack_params[f"layer{i}"]
        for norm, g, b in (("norm1", "ln1g", "ln1b"),
                           ("norm2", "ln2g", "ln2b"),
                           ("norm3", "ln3g", "ln3b")):
            out[g].append(f32(p[norm]["scale"]))
            out[b].append(f32(p[norm]["bias"]))
        sa = p["self_attn"]
        out["wqkv"].append(f32(sa["qkv_kernel"]))
        out["bqkv"].append(f32(sa["qkv_bias"]))
        out["wos"].append(f32(sa["out"]["kernel"]))
        out["bos"].append(f32(sa["out"]["bias"]))

        ca = p["cross_attn"]
        e = ca["qkv_kernel"].shape[0]
        d = e // h
        scale = np.float32(1.0) / np.sqrt(np.float32(d))
        wq = f32(ca["qkv_kernel"][:, :e])
        wk = f32(ca["qkv_kernel"][:, e:2 * e])
        wv = f32(ca["qkv_kernel"][:, 2 * e:])
        bq = f32(ca["qkv_bias"][:e])
        bk = f32(ca["qkv_bias"][e:2 * e])
        bv = f32(ca["qkv_bias"][2 * e:])
        wo = f32(ca["out"]["kernel"])
        bo = f32(ca["out"]["bias"])
        wq_h = wq.reshape(e, h, d)
        wk_h = wk.reshape(e, h, d)
        wv_h = wv.reshape(e, h, d)
        bq_h = bq.reshape(h, d)
        wo_h = wo.reshape(h, d, e)
        del bk  # b_k only feeds softmax-invariant score terms (see above)
        # Per-head folds, stored HEAD-BATCHED along the minor axes so the
        # kernel runs ONE wide dot per layer instead of h small ones (the
        # per-head [rb,e]x[e,e] loop serialized the MXU and made the
        # kernel lose at short L — VERDICT r2 weak-3 / docs/PERF.md
        # round 11):
        # aq[:, hh*e:(hh+1)*e] = s * W_q,h @ W_k,h^T  -> [e, h*e]
        out["aq"].append(
            (scale * jnp.einsum("ehd,fhd->ehf", wq_h, wk_h)
             ).reshape(e, h * e))
        # u[hh*e:(hh+1)*e] = s * W_k,h @ b_q,h        -> [h*e]
        out["u"].append(
            (scale * jnp.einsum("ehd,hd->he", wk_h, bq_h)).reshape(h * e))
        # wvo[hh*e:(hh+1)*e, :] = W_v,h @ W_o,h       -> [h*e, e]
        out["wvo"].append(
            jnp.einsum("ehd,hdf->hef", wv_h, wo_h).reshape(h * e, e))
        # bout = b_v @ W_o + b_o      -> [e]
        out["bout"].append(bv @ wo + bo)

        ff = p["ffn"]
        out["w1"].append(f32(ff["linear1"]["kernel"]))
        out["b1"].append(f32(ff["linear1"]["bias"]))
        out["w2"].append(f32(ff["linear2"]["kernel"]))
        out["b2"].append(f32(ff["linear2"]["bias"]))

    return {k: jnp.stack(v).astype(dtype) for k, v in out.items()}


# weight-operand order (must match the kernel's positional refs)
WEIGHT_KEYS = ("ln1g", "ln1b", "wqkv", "bqkv", "wos", "bos",
               "ln2g", "ln2b", "aq", "u", "wvo", "bout",
               "ln3g", "ln3b", "w1", "b1", "w2", "b2")


def _erf(x):
    """Polynomial erf (Abramowitz & Stegun 7.1.26, max abs err 1.5e-7 —
    far below bf16 resolution). Mosaic has no erf/erfc lowering, so the
    exact-gelu path (jax.nn.gelu(approximate=False)) is rebuilt on it."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf(x * np.float32(1.0 / np.sqrt(2.0))))


def _layernorm(x, g, b):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + _LN_EPS)
    return (y * g.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def _decoder_stack_kernel(t_ref, x_ref, m_ref, mk_ref, hk_ref, c_ref,
            ln1g, ln1b, wqkv, bqkv, wos, bos,
            ln2g, ln2b, aq, u, wvo, bout,
            ln3g, ln3b, w1, b1, w2, b2,
            xo_ref, co_ref, *, num_heads: int, num_layers: int):
    h = num_heads
    x = x_ref[...]                       # [rb, e] bf16
    m = m_ref[...]                       # [rb, L, e] bf16
    rb, e = x.shape
    d = e // h
    scale = np.float32(1.0) / np.sqrt(np.float32(d))
    t = t_ref[...]                       # [rb, 1] i32
    big_neg = neg_inf(jnp.float32)
    tmax = c_ref.shape[2]

    # caches ride batch-leading [rb, nl, T, 2E] so the same buffers serve
    # the chunk-decode state (refill_rows scatters on axis 0 = batch)
    mem_valid = mk_ref[...][:, None, :] > 0.5            # [rb, 1, L]
    mem_any = (jnp.max(mk_ref[...], axis=1) > 0.5
               ).astype(jnp.float32)[:, None]            # [rb, 1]
    hist_valid = hk_ref[...][:, None, :] > 0.5           # [rb, 1, T]
    hist_any = (jnp.max(hk_ref[...], axis=1) > 0.5
                ).astype(jnp.float32)[:, None]           # [rb, 1]
    lane_head = jax.lax.broadcasted_iota(jnp.int32, (1, 1, e), 2) // d
    iota_t = jax.lax.broadcasted_iota(jnp.int32, (1, tmax, 1), 1)
    write_here = iota_t == t[:, :, None]                 # [rb, T, 1]

    bc = lambda a, b_, ca_, cb_: jax.lax.dot_general(
        a, b_, (((ca_,), (cb_,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    mm = lambda a, b_: jax.lax.dot_general(
        a, b_, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    for l in range(num_layers):
        # ---- self-attention over the KV cache (DecoderLayer.step;
        #      residuals add onto the NORMED stream — ops/transformer
        #      module docstring) ----
        xn = _layernorm(x, ln1g[l:l + 1], ln1b[l:l + 1])
        qkv = (mm(xn, wqkv[l]) + bqkv[l:l + 1].astype(jnp.float32)
               ).astype(x.dtype)                       # [rb, 3e]
        q = qkv[:, :e]
        kv = qkv[:, e:]
        cache = jnp.where(write_here, kv[:, None, :], c_ref[:, l])
        co_ref[:, l] = cache
        k = cache[:, :, :e]
        v = cache[:, :, e:]
        qs = (q * jnp.asarray(scale, q.dtype))[:, None, :]  # [rb, 1, e]
        acc = jnp.zeros((rb, 1, e), jnp.float32)
        for hh in range(h):
            hm = lane_head == hh
            kh = jnp.where(hm, k, jnp.zeros((), k.dtype))
            s = bc(qs, kh, 2, 2)                       # [rb, 1, T] f32
            s = jnp.where(hist_valid, s, big_neg)
            p = jax.nn.softmax(s, axis=-1)
            vh = jnp.where(hm, v, jnp.zeros((), v.dtype))
            acc = acc + bc(p.astype(v.dtype), vh, 2, 1)
        a = acc[:, 0] * hist_any
        a = mm(a.astype(x.dtype), wos[l]) + bos[l:l + 1].astype(
            jnp.float32)
        x = xn + a.astype(x.dtype)

        # ---- folded cross-attention against the raw memory (the
        #      softmax-invariant score terms are dropped — module
        #      docstring) ----
        xn = _layernorm(x, ln2g[l:l + 1], ln2b[l:l + 1])
        # one wide dot for ALL heads' folded queries ([rb, e] x [e, h*e]),
        # then head-major reshape for the batched score/context dots —
        # h separate [rb,e]x[e,e] dots serialized the MXU and lost to the
        # XLA chain at short L (docs/PERF.md round 11)
        qf = (mm(xn, aq[l]) + u[l:l + 1].astype(jnp.float32)
              ).reshape(rb, h, e)                      # [rb, h, e] f32
        s = bc(qf.astype(x.dtype), m, 2, 2)            # [rb, h, L] f32
        s = jnp.where(mem_valid, s, big_neg)
        p = jax.nn.softmax(s, axis=-1)
        # all-masked rows: zero the probabilities like attend() (rows
        # with empty memories never occur: every memory starts [CLS])
        p = p * mem_any[:, :, None]
        cf = bc(p.astype(m.dtype), m, 2, 1)            # [rb, h, e] f32
        ctx = mm(cf.astype(x.dtype).reshape(rb, h * e), wvo[l])
        ctx = ctx + bout[l:l + 1].astype(jnp.float32)
        x = xn + ctx.astype(x.dtype)

        # ---- FFN (residual around the normalized stream) ----
        xn = _layernorm(x, ln3g[l:l + 1], ln3b[l:l + 1])
        f = mm(xn, w1[l]) + b1[l:l + 1].astype(jnp.float32)
        f = _gelu_exact(f)
        f = mm(f.astype(x.dtype), w2[l]) + b2[l:l + 1].astype(
            jnp.float32)
        x = xn + f.astype(x.dtype)

    xo_ref[...] = x


def _stack_core(t, x, m, mk, hk, caches, *weights_and_statics):
    """Positional dispatch (custom_partitioning needs positional statics):
    operands = 6 batch-leading arrays + the 18 stacked weight arrays
    (replicated under SPMD), then (num_heads, rows_per_block, interpret)."""
    weights = weights_and_statics[:-3]
    num_heads, rows_per_block, interpret = weights_and_statics[-3:]
    b, nl, tmax, e2 = caches.shape
    _, l, e = m.shape
    rb = rows_per_block
    while b % rb:
        rb -= 1
    grid = (b // rb,)
    kern = functools.partial(_decoder_stack_kernel, num_heads=num_heads, num_layers=nl)

    def bspec(shape, index):
        return pl.BlockSpec(shape, index)

    row2 = lambda i: (i, 0)
    row3 = lambda i: (i, 0, 0)
    const = lambda nd: (lambda i: (0,) * nd)
    in_specs = [
        bspec((rb, 1), row2),            # t
        bspec((rb, e), row2),            # x
        bspec((rb, l, e), row3),         # m
        bspec((rb, l), row2),            # mem keep
        bspec((rb, tmax), row2),         # hist keep
        bspec((rb, nl, tmax, e2), lambda i: (i, 0, 0, 0)),   # caches
    ]
    for w in weights:
        in_specs.append(bspec(w.shape, const(w.ndim)))
    out_specs = [
        bspec((rb, e), row2),
        bspec((rb, nl, tmax, e2), lambda i: (i, 0, 0, 0)),
    ]
    return pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((b, e), x.dtype),
                   jax.ShapeDtypeStruct(caches.shape, caches.dtype)],
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(t, x, m, mk, hk, caches, *weights)


# --- SPMD partitioning: batch-parallel over rows. The 6 leading operands
# (t, x, m, mk, hk, caches) and both results share the batch factor; the
# 18 stacked weight operands are params-derived and stay REPLICATED per
# shard (kernels/spmd.py's single-result scaffolding shards every
# operand's leading dim, which would wrongly split the weights' n_layers
# axis — hence this kernel-specific rule). Keeps the auto fused-stack
# gate usable inside data-parallel predict programs (runtime/mesh.py).

_N_BATCH_ARGS = 6
_BATCH_RANKS = (2, 2, 3, 2, 2, 4)                      # t x m mk hk caches
_WEIGHT_RANKS = (2, 2, 3, 2, 3, 2,                     # ln1g..bos
                 2, 2, 3, 2, 3, 2,                     # ln2g..bout
                 2, 2, 3, 2, 3, 2)                     # ln3g..b2


def _stack_rule() -> str:
    c = [0]

    def dims(rank, batch):
        out = ["b"] if batch else []
        for _ in range(rank - (1 if batch else 0)):
            out.append(f"f{c[0]}")
            c[0] += 1
        return " ".join(out)

    ins = ([dims(r, True) for r in _BATCH_RANKS]
           + [dims(r, False) for r in _WEIGHT_RANKS])
    outs = [dims(2, True), dims(4, True)]
    return ", ".join(ins) + " -> " + ", ".join(outs)


if HAVE_PALLAS:
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    def _batch_axis(arg_infos):
        s = arg_infos[0].sharding
        spec = s.spec if s is not None else PartitionSpec()
        return spec[0] if len(spec) else None

    def _result_shardings(mesh, arg_infos, result_infos):
        b = _batch_axis(arg_infos)
        return tuple(
            NamedSharding(mesh, PartitionSpec(b, *([None] * (len(r.shape)
                                                            - 1))))
            for r in result_infos)

    def _infer(*cb_args):   # (*statics, mesh, arg_infos, result_infos)
        mesh, arg_infos, result_infos = cb_args[-3:]
        return _result_shardings(mesh, arg_infos, result_infos)

    def _partition(*cb_args):
        statics = cb_args[:-3]
        mesh, arg_infos, result_infos = cb_args[-3:]
        rs = _result_shardings(mesh, arg_infos, result_infos)
        b = rs[0].spec[0]
        arg_sh = tuple(
            NamedSharding(mesh, PartitionSpec(b, *([None] * (len(a.shape)
                                                             - 1))))
            if i < _N_BATCH_ARGS else
            NamedSharding(mesh, PartitionSpec())
            for i, a in enumerate(arg_infos))

        def lower(*operands):
            return _stack_core(*operands, *statics)

        return mesh, lower, rs, arg_sh

    _stack_cp = custom_partitioning(
        _stack_core, static_argnums=(_N_BATCH_ARGS + len(_WEIGHT_RANKS),
                                     _N_BATCH_ARGS + len(_WEIGHT_RANKS) + 1,
                                     _N_BATCH_ARGS + len(_WEIGHT_RANKS) + 2))
    _stack_cp.def_partition(infer_sharding_from_operands=_infer,
                            partition=_partition,
                            sharding_rule=_stack_rule())
else:  # pragma: no cover
    _stack_cp = _stack_core


def stack_step(x: jnp.ndarray, t, caches: jnp.ndarray, m: jnp.ndarray,
               mem_keep: jnp.ndarray, hist_keep: jnp.ndarray,
               folded: Dict[str, jnp.ndarray], num_heads: int,
               rows_per_block: int = 8, layers_per_call: int = 2,
               interpret: bool | None = None
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One fused decode step through a whole decoder stack.

    x: [B, E] current hidden; t: scalar or [B] step indices (per-row for
    continuous batching; out-of-range rows skip their cache write);
    caches: [B, n_layers, T, 2E] packed K|V (batch-leading so the SAME
    buffers ride the refillable chunk-decode state); m: [B, L, E] raw
    encoder memory; mem_keep/hist_keep: [B, L]/[B, T] bool; folded:
    output of ``fold_stack_weights``. Returns (x_out [B, E], new caches).

    ``layers_per_call`` trades VMEM for HBM traffic: each Mosaic call
    holds its layers' folded weights (~2.9 MB/layer at E=256) plus one
    [rb, L, E] memory block resident, so the memory is re-read
    n_layers/layers_per_call times per step (vs n_layers K+V cache
    re-reads — 2*layers_per_call times less — on the XLA chain).
    """
    if interpret is None:
        interpret = _FORCE_INTERPRET
    b, e = x.shape
    nl = caches.shape[1]
    t = jnp.asarray(t, jnp.int32)
    t = jnp.broadcast_to(t.reshape(-1, 1) if t.ndim else t[None, None],
                         (b, 1))
    mk = mem_keep.astype(jnp.float32)
    hk = hist_keep.astype(jnp.float32)
    lc = min(layers_per_call, nl)
    while nl % lc:
        lc -= 1
    # XLA's buffer assignment promotes the loop-carried cache slice (a
    # custom-call output) into scoped VMEM; at large B the [B, lc, T, 2E]
    # slice blows the 16 MiB scoped limit at compile time (observed:
    # B=256, lc=2, T=40, 2E=512 bf16 -> "Ran out of memory in memory
    # space vmem ... 18.24M and limit 16.00M"). Shrink the layer chunk —
    # trading memory re-reads for VMEM — until the slice fits.
    # Per-DEVICE rows decide the scoped-VMEM footprint: under the batch
    # custom_partitioning rule each shard sees b/_DATA_SHARDS rows.
    slice_bytes = (-(-b // _DATA_SHARDS) * caches.shape[2] * caches.shape[3]
                   * caches.dtype.itemsize)
    while lc > 1 and slice_bytes * lc > _VMEM_CACHE_BYTES:
        lc -= 1
        while nl % lc:
            lc -= 1
    new_caches = []
    for l0 in range(0, nl, lc):
        weights = [folded[k][l0:l0 + lc] for k in WEIGHT_KEYS]
        x, cs = _stack_cp(t, x, m, mk, hk, caches[:, l0:l0 + lc],
                          *weights, num_heads, rows_per_block,
                          bool(interpret))
        new_caches.append(cs)
    return x, (new_caches[0] if len(new_caches) == 1
               else jnp.concatenate(new_caches, axis=1))


def pallas_available() -> bool:
    return HAVE_PALLAS

"""Multi-memory transformer decoder with copy extension (Masque/CaSE family).

TPU-native rebuild of Masque/Model.py:13-119 (``MasqueTransformerSeqDecoder``)
and CaSE/Model.py:13-125 (``CaSETransformerSeqDecoder``), which differ only in
that CaSE conditions on an additional answer-vector feature (extra LayerNorm,
2D bilinear-attention queries, a 3D generator input with dropout).

Semantics preserved exactly:
* M chained per-memory decoder stacks; the bilinear copy attention for memory
  i queries the stream *after* stack i, pre-final-norm (Masque/Model.py:66-77);
* per-memory attention is prior-weighted and renormalized with the 1e-8 guard
  (Masque/Model.py:74-76, CaSE/Model.py:81-82);
* the generator is a softmax over the vocabulary; the ``mix`` head splits
  probability mass between generation and the M copy distributions
  (extend, Masque/Model.py:37-44);
* training gathers target probabilities directly (no [B, T, V_ext] copy
  tensor); greedy decoding is a KV-cached ``lax.scan`` replacing the
  reference's per-step full-prefix recompute (CaSE/Model.py:91-123).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import functools

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.bilinear import BilinearAttention
from ..ops.copynet import copy_scatter
from ..ops.embedding import Embedding
from ..ops.positional import PositionalEmbedding
from ..ops.transformer import Decoder
from ..ops.dropout import Dropout

_LN_EPS = 1e-5

# Fused decoder-stack decode step (kernels/decoder_stack.py): one Mosaic
# program per stack per step instead of the ~60-op per-layer XLA chain,
# with the cross K/V caches folded away (the raw memory is read once per
# layer-group). None = auto (bf16 + TPU + long memory), set via
# set_fused_stack / --fused_stack.
_FUSED_STACK = None
# auto threshold: the kernel wins on long memories and loses on short
# ones (L=1000: 226 vs 386 us/step; L=60: 126 vs 24 — docs/PERF.md
# round 10), so auto only fuses stacks whose memory is at least this long
_FUSED_MIN_L = 512


def set_fused_stack(on) -> None:
    """True=force, False=off, None=auto (measured default)."""
    global _FUSED_STACK
    _FUSED_STACK = on


class MultiMemoryDecoder(nn.Module):
    vocab_size: int
    hidden_size: int
    num_heads: int
    num_layers: int
    num_memories: int = 2
    use_feature: bool = False   # CaSE's additional_decoder_feature
    dropout: float = 0.1
    bos_id: int = 1
    eos_id: int = 3

    def setup(self):
        d, v = self.hidden_size, self.vocab_size
        init = nn.initializers.xavier_uniform()
        self.embedding = Embedding(v, d)
        self.pos = PositionalEmbedding(d, dropout=self.dropout, max_len=1000)
        self.decs = [Decoder(self.num_layers, d, self.num_heads, d_ff=d,
                             dropout=self.dropout, activation="gelu",
                             name=f"dec{i}") for i in range(self.num_memories)]
        q_size = 2 * d if self.use_feature else d
        self.attns = [BilinearAttention(q_size, d, d, name=f"attn{i}")
                      for i in range(self.num_memories)]
        self.norm1 = nn.LayerNorm(epsilon=_LN_EPS)
        if self.use_feature:
            self.norm2 = nn.LayerNorm(epsilon=_LN_EPS)
        self.gen1 = nn.Dense(d, kernel_init=init)
        self.gen_drop = Dropout(self.dropout)
        self.feat_drop = Dropout(self.dropout)
        self.gen2 = nn.Dense(v, use_bias=False, kernel_init=init)
        self.mix = nn.Dense(self.num_memories + 1, kernel_init=init)

    # ---- shared per-position math ----

    def _generator_parts(self, dec_input, dec_normed, feature, deterministic):
        """(pre-softmax hidden h [.., d], vocabulary logits [.., V])."""
        parts = [dec_input, dec_normed]
        if self.use_feature:
            parts.append(feature)
        h = self.gen1(jnp.concatenate(parts, axis=-1))
        if self.use_feature:  # CaSE has a dropout inside gen (CaSE/Model.py:34)
            h = self.gen_drop(h, deterministic=deterministic)
        return h, self.gen2(h)

    def _generator(self, dec_input, dec_normed, feature, deterministic):
        return jax.nn.softmax(
            self._generator_parts(dec_input, dec_normed, feature,
                                  deterministic)[1], axis=-1)

    def _memory_attend(self, i, stream, feature, memory, mem_keep, weight,
                       tgt_keep, uh=None):
        """Prior-weighted renormalized copy attention for memory i.
        stream: [B, T, D]; returns (context [B, T, D], p [B, T, Lm]).
        ``uh``: optionally precomputed key projection (decode scans)."""
        q = jnp.concatenate([stream, feature], -1) if self.use_feature else stream
        mask = tgt_keep[:, :, None] & mem_keep[:, None, :]
        if uh is None:
            ctx, _, nw = self.attns[i](q, memory, memory, mask=mask)
        else:
            ctx, _, nw = self.attns[i].attend_from_proj(q, uh, memory, mask=mask)
        p = weight[:, None, :] * nw
        p = p / (1e-8 + jnp.sum(p, axis=-1, keepdims=True))
        return ctx, p

    # ---- training ----

    def teacher_force(self, memories: Sequence[jnp.ndarray],
                      mem_keeps: Sequence[jnp.ndarray],
                      weights: Sequence[jnp.ndarray],
                      src_ids: Sequence[jnp.ndarray],
                      targets: jnp.ndarray,
                      feature: Optional[jnp.ndarray] = None,
                      *, deterministic: bool = False) -> jnp.ndarray:
        """Returns prob_at_target [B, T] = (dist1 + dist2)[target]."""
        b, t = targets.shape
        bos = jnp.full((b, 1), self.bos_id, targets.dtype)
        inputs = jnp.concatenate([bos, targets[:, :-1]], axis=1)
        tgt_keep = inputs != 0
        dec_input = self.pos(self.embedding(inputs), deterministic=deterministic)

        feat = None
        if self.use_feature:
            feat = self.norm2(feature)[:, None, :]
            feat = jnp.broadcast_to(feat, (b, t, feat.shape[-1]))
            feat = self.feat_drop(feat, deterministic=deterministic)

        x = dec_input
        ctxs, ps = [], []
        for i in range(self.num_memories):
            x = self.decs[i](x, memories[i], tgt_keep, mem_keeps[i],
                             deterministic=deterministic)
            ctx, p = self._memory_attend(i, x, feat, memories[i], mem_keeps[i],
                                         weights[i], tgt_keep)
            ctxs.append(ctx)
            ps.append(p)
        x = self.norm1(x)

        gen = self._generator(dec_input, x, feat, deterministic)   # [B, T, V]
        mix_p = jax.nn.softmax(self.mix(jnp.concatenate([x] + ctxs, -1)), -1)

        gen_at = jnp.take_along_axis(gen, targets[..., None], axis=-1)[..., 0]
        prob_at = mix_p[..., 0] * gen_at
        for i in range(self.num_memories):
            match = (src_ids[i][:, None, :] == targets[:, :, None]).astype(gen.dtype)
            copy_at = jnp.einsum("btl,btl->bt", ps[i], match)
            prob_at = prob_at + mix_p[..., i + 1] * copy_at
        return prob_at

    __call__ = teacher_force

    # ---- shared per-step machinery for greedy/sample/beam decoding ----

    def _fused_stack(self, memory) -> bool:
        """Whether this memory's stack decodes through the fused Pallas
        kernel (kernels/decoder_stack.py). Shape/dtype/global-driven, so
        chunk_init and chunk_step resolve identically for one state."""
        try:
            from ..kernels import decoder_stack as _ds
        except Exception:  # pragma: no cover
            return False
        if not _ds.pallas_available() or _FUSED_STACK is False:
            return False
        if _FUSED_STACK:   # forced (tests force via interpret hook)
            return True
        # auto: bf16 TPU inference, long-memory stacks only
        if memory.dtype != jnp.bfloat16:
            return False
        if not _ds._FORCE_INTERPRET and jax.default_backend() != "tpu":
            return False
        return memory.shape[1] >= _FUSED_MIN_L

    def _folded(self, i, dtype):
        """Folded fused-stack operands for stack ``i`` ([n_layers, ...]
        arrays — params-derived, request-independent: recomputed per jit
        call OUTSIDE the step scan, never stored in refillable state)."""
        from ..kernels.decoder_stack import fold_stack_weights
        return fold_stack_weights(self.decs[i].variables["params"],
                                  self.num_layers, self.num_heads, dtype)

    def _decode_precompute(self, memories, feature):
        """Per-sequence precomputes: per-stack cross K/V (or, for fused
        stacks, the folded weight dict — the kernel reads the raw memory
        instead of per-layer K/V caches), copy-attention key projections,
        and the (normed, dropout-off) feature vector."""
        cross = [self._folded(i, memories[i].dtype)
                 if self._fused_stack(memories[i])
                 else self.decs[i].precompute_memory(memories[i])
                 for i in range(self.num_memories)]
        key_projs = [self.attns[i].key_proj(memories[i])
                     for i in range(self.num_memories)]
        feat = None
        if self.use_feature:
            feat = self.norm2(feature)[:, None, :]   # [B, 1, D]; dropout off
        return cross, key_projs, feat

    def _init_caches(self, b, max_len, memories):
        """Per-stack KV caches: per-layer [B, T, 2E] lists for the XLA
        chain, one stacked batch-leading [B, n_layers, T, 2E] array for
        fused stacks (refill_rows scatters on axis 0 either way)."""
        return [jnp.zeros((b, self.num_layers, max_len,
                           2 * self.hidden_size), m.dtype)
                if self._fused_stack(m)
                else self.decs[i].init_cache(b, max_len, m.dtype)
                for i, m in enumerate(memories)]

    def _step_core(self, caches, prev, hist, t, cross, key_projs, feat,
                   memories, mem_keeps, weights):
        """One decode step through the stacks, copy attentions, generator
        and mix gate. ``t`` is a scalar (scan decode) or [B] per-row step
        indices (continuous batching — the math is row-independent, so
        per-row positions change nothing but the write locations).
        Returns (new_caches, hist, gen [B,1,V], mix_p
        [B,1,M+1], ps: per-memory copy probs [B,1,Lm], gen_h [B,1,d],
        gen_logits [B,1,V]) — gen == softmax(gen_logits); callers that
        don't consume the extra parts leave them to XLA's DCE."""
        from ..ops.cache import write_step

        hist = write_step(hist, (prev != 0)[:, None], t)
        emb = self.pos(self.embedding(prev[:, None]), offset=t,
                       deterministic=True)
        x = emb
        new_caches, ctxs, ps = [], [], []
        tgt_keep_t = (prev != 0)[:, None]
        for i in range(self.num_memories):
            if isinstance(cross[i], dict):   # fused stack: folded weights
                from ..kernels.decoder_stack import stack_step
                y, c = stack_step(x[:, 0], t, caches[i], memories[i],
                                  mem_keeps[i], hist, cross[i],
                                  self.num_heads)
                x = y[:, None, :]
            else:
                x, c = self.decs[i].step(x, t, caches[i], cross[i], hist,
                                         mem_keeps[i])
            ctx, p = self._memory_attend(i, x, feat, memories[i],
                                         mem_keeps[i], weights[i],
                                         tgt_keep_t, uh=key_projs[i])
            new_caches.append(c)
            ctxs.append(ctx)
            ps.append(p)
        x = self.norm1(x)
        gen_h, gen_logits = self._generator_parts(emb, x, feat, True)
        gen = jax.nn.softmax(gen_logits, axis=-1)
        mix_p = jax.nn.softmax(self.mix(jnp.concatenate([x] + ctxs, -1)), -1)
        return new_caches, hist, gen, mix_p, ps, gen_h, gen_logits

    def _extend_dist(self, gen, mix_p, ps, src_ids):
        """Copy-extended distribution (extend — Masque/Model.py:37-44)."""
        dist = mix_p[..., 0:1] * gen
        for i in range(self.num_memories):
            dist = dist + mix_p[..., i + 1:i + 2] * copy_scatter(
                ps[i], src_ids[i], self.vocab_size)
        return dist

    def _resolve_fast_argmax(self, fast_argmax, src_ids, dtype):
        """(fast_argmax, use_pallas_comb) — the auto gate documented on
        ``decode``. Must resolve identically wherever the same decode
        configuration is rebuilt (scan decode, chunk_init, chunk_step).

        Accepted modes (``--fast_argmax``):
        * ``None``/"auto" — measured default (currently dense; see below).
        * ``False``/"dense" — the [B, V] copy scatter + argmax.
        * "mxu" — candidate argmax; duplicate-id copy mass combined by one
          MXU matvec against the hoisted first-occurrence matrix.
        * "pallas" — candidate argmax via the ``combine_copy_mass`` Mosaic
          kernel (regressed 8x under this image's XLA — docs/PERF.md
          round 9; kept reachable for re-probes). Falls back to "mxu"
          where Pallas is unavailable.
        * ``True`` — back-compat alias for "pallas".
        """
        try:
            from ..kernels import copy_argmax as _ca
            pallas_ok = _ca.pallas_available()
        except Exception:  # pragma: no cover
            pallas_ok = False
        if isinstance(fast_argmax, str):
            mode = fast_argmax.lower()
            if mode not in ("auto", "dense", "mxu", "pallas"):
                raise ValueError(f"fast_argmax mode {fast_argmax!r} not in "
                                 "(auto, dense, mxu, pallas)")
            if mode == "auto":
                fast_argmax = None
            elif mode == "dense":
                fast_argmax = False
            elif mode == "mxu":
                return True, False
            else:  # pallas (falls back to mxu off-TPU)
                return True, pallas_ok
        if fast_argmax is None:
            # Auto stays dense — settled by the round-11 same-session e2e
            # sweep (tools/exp_all_models_qps.py --argmax_modes, B=64 bf16,
            # fused stack on): case dense 812 / mxu 681 / pallas 682 qps,
            # masque 1011 / 793 / 806. The scatter-variants probe's 2.5x
            # per-op win (220 vs 555 us) does not survive composition: the
            # hoisted comb_m is [B, Ls, Ls] bf16 = 144 MB at B=64, Ls=1060
            # — >=176 us/step of HBM traffic at the 819 GB/s roofline just
            # to read it, while the e2e dense scatter+argmax epilogue
            # measures ~78 us/step fused into the step program (docs/
            # PERF.md rounds 9 and 11). The MXU variant cannot win at
            # these shapes; it stays reachable for other (small-Ls)
            # deployments via --fast_argmax mxu.
            fast_argmax = False
        return fast_argmax, fast_argmax and pallas_ok

    def _argmax_precompute(self, src_ids, dtype, fast_argmax,
                           use_pallas_comb):
        """Step-invariant operands of the greedy argmax: the concatenated
        source ids, plus per-mode hoisted tensors (all [B, ...], so they
        ride in the chunk-decode state and refill row-wise)."""
        ids_cat = jnp.concatenate(src_ids, axis=-1)   # [B, Ls]
        extras = {}
        if use_pallas_comb:
            # hoisted gathered generator columns: per step, the logits at
            # the (step-invariant) source ids are one [B,Ls,d]x[B,d]
            # matvec instead of a serialized [B, V] gather
            from ..kernels.copy_argmax import gather_weight_columns
            w_at, _ = gather_weight_columns(
                self.gen2.variables["params"]["kernel"].T, ids_cat)
            extras["w_at"] = w_at
        elif fast_argmax:
            # step-invariant duplicate-id structure: for each source position,
            # the index of the first position carrying the same vocab id.
            # Per step, copy mass is combined onto first occurrences with one
            # MXU matvec against this one-hot matrix (scatters serialize
            # their 64k updates on TPU; the matvec streams at HBM rate —
            # tools/exp_scatter_variants.py: 219 vs 801 us/step at B=64).
            eq = ids_cat[:, :, None] == ids_cat[:, None, :]      # [B, Ls, Ls]
            first_occ = jnp.argmax(eq, axis=-1).astype(jnp.int32)  # [B, Ls]
            ls = ids_cat.shape[1]
            is_first = first_occ == jnp.arange(ls)[None, :]
            # comb_m[b, k, l] = 1 iff first occurrence of ids[b, l] is k.
            # The optimization barrier forces the matrix to MATERIALIZE here:
            # without it XLA re-derives it from the comparison INSIDE the
            # scan body each step, fusing compare+multiply+reduce into a VPU
            # loop (xprof: 0.68 ms/step) instead of one MXU matvec over the
            # hoisted operand (0.22 ms — tools/exp_scatter_variants.py).
            comb_m = (first_occ[:, None, :]
                      == jnp.arange(ls)[None, :, None]).astype(dtype)
            extras["comb_m"] = jax.lax.optimization_barrier(comb_m)
            extras["is_first"] = is_first
        return ids_cat, extras

    def _greedy_next(self, gen, mix_p, ps, gen_h, gen_logits, src_ids,
                     ids_cat, extras, fast_argmax, use_pallas_comb):
        """Argmax over the copy-extended distribution for one step
        (modes documented on ``decode``). Returns nxt [B] int32."""
        if not fast_argmax:
            dist = self._extend_dist(gen, mix_p, ps, src_ids)
            return jnp.argmax(dist[:, 0], axis=-1).astype(jnp.int32)
        cw = jnp.concatenate(
            [mix_p[:, 0, i + 1:i + 2] * ps[i][:, 0]
             for i in range(self.num_memories)], axis=-1)   # [B, Ls]
        if use_pallas_comb:
            from ..kernels.copy_argmax import candidate_argmax_from_logits
            # logits at the source ids via the hoisted gathered gen2
            # columns (a per-step [B, V] gather is 0.68 ms/step); every
            # duplicate carries its group's mass, so argmax lands on the
            # first occurrence
            w_at = extras["w_at"]
            l_at = jnp.einsum("bld,bd->bl", w_at,
                              gen_h[:, 0].astype(w_at.dtype))
            return candidate_argmax_from_logits(
                gen_logits[:, 0], l_at, mix_p[:, 0, 0], cw, ids_cat)
        comb_m, is_first = extras["comb_m"], extras["is_first"]
        g = mix_p[:, 0, 0:1] * gen[:, 0]                # [B, V]
        g_idx = jnp.argmax(g, axis=-1)
        g_val = jnp.take_along_axis(g, g_idx[:, None], -1)[:, 0]
        g_at = jnp.take_along_axis(g, ids_cat, axis=-1)
        comb = jnp.einsum("bkl,bl->bk", comb_m, cw.astype(comb_m.dtype))
        cand = jnp.where(is_first, g_at + comb, -1.0)
        c_pos = jnp.argmax(cand, axis=-1)
        c_val = jnp.take_along_axis(cand, c_pos[:, None], -1)[:, 0]
        c_idx = jnp.take_along_axis(ids_cat, c_pos[:, None], -1)[:, 0]
        return jnp.where(c_val > g_val, c_idx, g_idx).astype(jnp.int32)

    # ---- chunked greedy decoding with per-row progress (continuous
    #      batching: rows refilled mid-flight sit at different absolute
    #      positions; decode math is row-independent, so per-request
    #      results are identical to the one-shot scan decode —
    #      tests/test_continuous.py) ----

    def chunk_init(self, memories, mem_keeps, weights, src_ids, max_len: int,
                   feature: Optional[jnp.ndarray] = None,
                   fast_argmax: Optional[bool] = None,
                   row_max: Optional[jnp.ndarray] = None,
                   row_keys: Optional[jnp.ndarray] = None,
                   row_ctl: Optional[jnp.ndarray] = None) -> dict:
        """Build the per-row decode state consumed by ``chunk_step``.

        Every leaf is a [B, ...] array, so a serving driver can scatter
        fresh rows (from a ``chunk_init`` on newly arrived requests) into
        a live state with ``decode.continuous.refill_rows``.

        ``row_max`` [B]: per-row response caps (requests' ``max_tokens``);
        a row ends at its own cap instead of ``max_len``.

        ``row_keys`` [B, 2] uint32: per-row PRNG key data for SAMPLED
        continuous decoding (``chunk_step(sampling=True)``). The key rides
        with the row (refilled rows bring their own), and the step key is
        ``fold_in(row_key, trow)`` — so a request's sampled tokens depend
        only on (params, its features, its key), not on batch composition,
        chunk size, or refill timing.

        ``row_ctl`` [B, 3] f32: per-row sampling controls (temperature,
        top_k, top_p) — each request's controls ride with its row and
        apply via decode/loops.sampling_controls_rows."""
        b = memories[0].shape[0]
        fast_argmax, use_pallas_comb = self._resolve_fast_argmax(
            fast_argmax, src_ids, memories[0].dtype)
        cross, key_projs, feat = self._decode_precompute(memories, feature)
        # fused stacks: the folded weights are [n_layers, ...] (NOT
        # batch-leading) and params-derived — they must not ride the
        # refillable state (refill_rows scatters axis 0). Store an empty
        # placeholder; chunk_step re-folds per call (cheap, outside the
        # step scan).
        cross = [[] if isinstance(c, dict) else c for c in cross]
        caches = self._init_caches(b, max_len, memories)
        ids_cat, extras = self._argmax_precompute(
            src_ids, memories[0].dtype, fast_argmax, use_pallas_comb)
        state = {
            "caches": caches, "cross": cross, "key_projs": key_projs,
            "feat": feat, "memories": list(memories),
            "mem_keeps": list(mem_keeps), "weights": list(weights),
            "src_ids": list(src_ids), "ids_cat": ids_cat, "extras": extras,
            "prev": jnp.full((b,), self.bos_id, jnp.int32),
            "trow": jnp.zeros((b,), jnp.int32),
            "done": jnp.zeros((b,), bool),
            "hist": jnp.zeros((b, max_len), bool),
            "out": jnp.zeros((b, max_len), jnp.int32),
            "row_max": jnp.full((b,), max_len, jnp.int32) if row_max is None
            else jnp.clip(row_max.astype(jnp.int32), 1, max_len),
        }
        if row_keys is not None:
            state["keys"] = row_keys.astype(jnp.uint32)
        if row_ctl is not None:
            state["ctl"] = row_ctl.astype(jnp.float32)
        return state

    def chunk_step(self, state: dict, n_steps: int,
                   fast_argmax: Optional[bool] = None,
                   sampling: bool = False, unk_id: int = 2,
                   temperature: float = 1.0, top_k: int = 0,
                   top_p: float = 1.0) -> dict:
        """Advance every non-done row by ``n_steps`` decode steps.

        Done rows freeze (their writes are dropped via out-of-range
        indices); a row becomes done when it emits EOS or fills max_len.
        ``fast_argmax`` must match the ``chunk_init`` that built the
        state (both resolve the auto gate identically).

        ``sampling=True`` samples each step from the extended distribution
        instead of arg-maxing, with ``sample``'s bookkeeping (EOS at a
        row's step 0 rewritten to UNK, forced EOS at the row's cap). The
        per-row step key is ``fold_in(row_key, trow)`` over the state's
        ``keys`` (see ``chunk_init``), so sampled answers are reproducible
        per request regardless of batch composition — top_k=1 is
        bit-identical to the batch ``sample`` path (tests)."""
        fast_argmax, use_pallas_comb = self._resolve_fast_argmax(
            fast_argmax, state["src_ids"], state["memories"][0].dtype)
        max_len = state["out"].shape[1]
        b = state["out"].shape[0]
        cross, key_projs, feat = (state["cross"], state["key_projs"],
                                  state["feat"])
        # fused stacks ride as empty cross placeholders (chunk_init):
        # re-fold the kernel operands here, OUTSIDE the step scan
        cross = [self._folded(i, state["memories"][i].dtype)
                 if (isinstance(c, (list, tuple)) and len(c) == 0
                     and self._fused_stack(state["memories"][i]))
                 else c for i, c in enumerate(cross)]
        memories, mem_keeps, weights, src_ids = (
            state["memories"], state["mem_keeps"], state["weights"],
            state["src_ids"])
        ids_cat, extras = state["ids_cat"], state["extras"]
        row_max = state["row_max"]
        rows = jnp.arange(b)
        if sampling:
            from ..decode.loops import (sampling_controls,
                                        sampling_controls_rows)
            # pin the impl: row keys are threefry key data regardless of
            # the global default (see models/predict.py)
            wrap = functools.partial(jax.random.wrap_key_data,
                                     impl="threefry2x32")
            row_keys = jax.vmap(wrap)(state["keys"])
            ctl = state.get("ctl")

        def body(carry, _):
            caches, prev, hist, trow, done, out = carry
            # done rows: writes target index max_len -> dropped
            t_w = jnp.where(done, max_len, trow)
            new_caches, hist, gen, mix_p, ps, gen_h, gen_logits = \
                self._step_core(caches, prev, hist, t_w, cross, key_projs,
                                feat, memories, mem_keeps, weights)
            if sampling:
                # same distribution as ``sample``: log of the extended
                # copy-mixed dist + standard controls (defaults identity)
                dist = self._extend_dist(gen, mix_p, ps, src_ids)
                logits = jnp.log(dist[:, 0].astype(jnp.float32) + 1e-10)
                if ctl is not None:   # per-request controls ride the rows
                    logits = sampling_controls_rows(
                        logits, ctl[:, 0], ctl[:, 1].astype(jnp.int32),
                        ctl[:, 2])
                else:
                    logits = sampling_controls(logits, temperature, top_k,
                                               top_p)
                keys_t = jax.vmap(jax.random.fold_in)(row_keys, trow)
                nxt = jax.vmap(jax.random.categorical)(keys_t, logits
                                                       ).astype(jnp.int32)
                raw_end = nxt == self.eos_id
                nxt = jnp.where((trow == 0) & raw_end, unk_id, nxt)
                nxt = jnp.where(trow >= row_max - 1, self.eos_id, nxt)
            else:
                nxt = self._greedy_next(gen, mix_p, ps, gen_h, gen_logits,
                                        src_ids, ids_cat, extras,
                                        fast_argmax, use_pallas_comb)
                raw_end = nxt == self.eos_id
            active = ~done
            out = out.at[rows, t_w].set(nxt, mode="drop")
            newly = active & (raw_end | (trow >= row_max - 1))
            prev = jnp.where(active, nxt, prev)
            trow = jnp.where(active & ~newly, trow + 1, trow)
            return (new_caches, prev, hist, trow, done | newly, out), ()

        carry = (state["caches"], state["prev"], state["hist"],
                 state["trow"], state["done"], state["out"])
        carry, _ = jax.lax.scan(body, carry, None, length=n_steps)
        caches, prev, hist, trow, done, out = carry
        return dict(state, caches=caches, prev=prev, hist=hist, trow=trow,
                    done=done, out=out)

    # ---- greedy decoding (argmax over the extended distribution,
    #      no EOS bookkeeping — ref CaSE/Model.py:119-123) ----

    def decode(self, memories, mem_keeps, weights, src_ids, max_len: int,
               feature: Optional[jnp.ndarray] = None,
               early_exit: bool = False,
               fast_argmax: Optional[bool] = None) -> jnp.ndarray:
        """``early_exit=True`` stops once every row has emitted EOS at least
        once (remaining positions stay PAD). The reference keeps arg-maxing
        past EOS (CaSE/Model.py:119-123) but its ``to_sentence`` truncates at
        EOS, so emitted answers are identical either way.

        ``fast_argmax`` replaces the per-step [B, V] copy scatter with a
        candidate-set argmax: the extended distribution differs from the
        generation distribution only at source-token ids, so the argmax is
        either argmax(gen) or the best source id after combining duplicate-id
        copy mass. xprof on the real predict program shows the V-wide
        scatter is the largest single decode op (0.43-0.57 ms at B=64; its
        cost is the 64·1060 serialized updates). Two combines exist:

        * the Pallas kernel ``kernels/copy_argmax.combine_copy_mass``
          computes the duplicate-id comparison tiles on the fly in VMEM —
          47 us/step vs the 509 us f32 scatter, no hoisted HBM operand
          (tools/exp_scatter_variants.py, docs/PERF.md round 6);
        * the XLA fallback is ONE [B, Ls, Ls] einsum against a hoisted
          first-occurrence matrix (182 us/step isolated, but its 145 MB
          operand read each step loses e2e — round 4).

        ``fast_argmax=None`` (auto, the serving default) keeps the dense
        scatter + argmax: the round-6 Pallas-combine win regressed under
        this image's later XLA/relay update (741 us/step vs 78 us dense —
        docs/PERF.md round 9), so auto resolves to False for every dtype.
        True forces candidate argmax (Pallas where available — it carries
        a custom_partitioning batch rule, so sharded programs run it per
        shard — einsum elsewhere), False forces the dense scatter. Exact
        up to rounding of the duplicate combine and tie-breaks
        (equivalence tests decode identically to the dense path; probe
        argmax cross-check on TPU 100% — docs/PERF.md round 6)."""
        b = memories[0].shape[0]
        fast_argmax, use_pallas_comb = self._resolve_fast_argmax(
            fast_argmax, src_ids, memories[0].dtype)
        cross, key_projs, feat = self._decode_precompute(memories, feature)
        caches = self._init_caches(b, max_len, memories)
        ids_cat, extras = self._argmax_precompute(
            src_ids, memories[0].dtype, fast_argmax, use_pallas_comb)

        def step(carry, t):
            caches, prev, hist = carry
            new_caches, hist, gen, mix_p, ps, gen_h, gen_logits = \
                self._step_core(caches, prev, hist, t, cross, key_projs,
                                feat, memories, mem_keeps, weights)
            nxt = self._greedy_next(gen, mix_p, ps, gen_h, gen_logits,
                                    src_ids, ids_cat, extras, fast_argmax,
                                    use_pallas_comb)
            return (new_caches, nxt, hist), nxt

        prev0 = jnp.full((b,), self.bos_id, jnp.int32)
        hist0 = jnp.zeros((b, max_len), bool)
        if not early_exit:
            _, ids = jax.lax.scan(step, (caches, prev0, hist0),
                                  jnp.arange(max_len))
            return ids.T

        out0 = jnp.zeros((b, max_len), jnp.int32)
        ended0 = jnp.zeros((b,), bool)

        def cond(c):
            t, _, _, _, ended, _ = c
            return (t < max_len) & ~jnp.all(ended)

        def wbody(c):
            t, caches, prev, hist, ended, out = c
            (caches, nxt, hist), _ = step((caches, prev, hist), t)
            out = jax.lax.dynamic_update_slice(out, nxt[:, None], (0, t))
            ended = ended | (nxt == self.eos_id)
            return (t + 1, caches, nxt, hist, ended, out)

        _, _, _, _, _, out = jax.lax.while_loop(
            cond, wbody, (jnp.int32(0), caches, prev0, hist0, ended0, out0))
        return out

    # ---- categorical sampling (capability beyond the reference, which only
    #      has greedy for these decoders) ----

    def sample(self, memories, mem_keeps, weights, src_ids, max_len: int,
               rng, feature: Optional[jnp.ndarray] = None,
               unk_id: int = 2, temperature: float = 1.0, top_k: int = 0,
               top_p: float = 1.0) -> jnp.ndarray:
        """Samples each step from the extended (copy-mixed) distribution,
        with the same EOS bookkeeping as decode/loops.run_sample: an EOS at
        t=0 is rewritten to UNK, the final step forces EOS, and positions
        after a row's EOS emit PAD (ref bookkeeping: common/Generations.py
        sample:47-58; the reference never samples CaSE/Masque, so the
        distribution choice — the model's actual output distribution, no
        double softmax — is ours). temperature/top_k/top_p apply the
        standard controls (decode/loops.sampling_controls) on the log of
        the extended distribution; defaults are identity."""
        from ..decode.loops import sampling_controls
        b = memories[0].shape[0]
        cross, key_projs, feat = self._decode_precompute(memories, feature)
        caches = self._init_caches(b, max_len, memories)

        def body(carry, inp):
            t, key = inp
            caches, prev, hist, ended = carry
            new_caches, hist, gen, mix_p, ps, _, _ = self._step_core(
                caches, prev, hist, t, cross, key_projs, feat, memories,
                mem_keeps, weights)
            dist = self._extend_dist(gen, mix_p, ps, src_ids)
            logits = jnp.log(dist[:, 0].astype(jnp.float32) + 1e-10)
            logits = sampling_controls(logits, temperature, top_k, top_p)
            nxt = jax.random.categorical(key, logits).astype(jnp.int32)
            this_end = nxt == self.eos_id
            nxt = jnp.where((t == 0) & this_end, unk_id, nxt)
            nxt = jnp.where(t == max_len - 1, self.eos_id, nxt)
            nxt = jnp.where((t > 0) & ended, 0, nxt)
            ended = ended | this_end
            return (new_caches, nxt, hist, ended), nxt

        prev0 = jnp.full((b,), self.bos_id, jnp.int32)
        hist0 = jnp.zeros((b, max_len), bool)
        ended0 = jnp.zeros((b,), bool)
        keys = jax.random.split(rng, max_len)
        _, ids = jax.lax.scan(body, (caches, prev0, hist0, ended0),
                              (jnp.arange(max_len), keys))
        return ids.T

    # ---- beam decoding (capability beyond the reference, which only has
    #      greedy for these decoders; uses the shared vectorized beam) ----

    def beam(self, memories, mem_keeps, weights, src_ids, max_len: int,
             width: int, feature: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        from ..decode.loops import run_beam, tile_state

        b = memories[0].shape[0]
        memories = [jnp.repeat(m, width, axis=0) for m in memories]
        mem_keeps = [jnp.repeat(m, width, axis=0) for m in mem_keeps]
        weights = [jnp.repeat(w, width, axis=0) for w in weights]
        src_ids = [jnp.repeat(s, width, axis=0) for s in src_ids]
        bw = b * width
        feature_t = jnp.repeat(feature, width, axis=0) \
            if self.use_feature else None
        cross, key_projs, feat = self._decode_precompute(memories, feature_t)

        state0 = {
            "caches": self._init_caches(bw, max_len, memories),
            "hist": jnp.zeros((bw, max_len), bool),
            "t": jnp.zeros((bw, 1), jnp.int32),
        }

        def step_fn(state, prev):
            t = state["t"][0, 0]
            caches, hist, gen, mix_p, ps, _, _ = self._step_core(
                state["caches"], prev, state["hist"], t, cross, key_projs,
                feat, memories, mem_keeps, weights)
            dist = self._extend_dist(gen, mix_p, ps, src_ids)
            new_state = {"caches": caches, "hist": hist, "t": state["t"] + 1}
            return dist[:, 0], new_state

        return run_beam(step_fn, state0, b, max_len, width,
                        self.bos_id, self.eos_id)

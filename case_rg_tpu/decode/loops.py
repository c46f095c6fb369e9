"""Generic decode loops as ``lax.scan``s.

TPU-native rebuild of common/Generations.py. The reference drives a Python
loop per step (greedy:66-110, sample:7-63) and a per-sample object-graph beam
(beam:112-190, ``Node``). Here every loop is a fixed-length ``lax.scan`` over
a step closure::

    step_fn(state, prev_ids[B]) -> (scores[B, V], new_state)

* ``run_greedy`` reproduces the reference's EOS bookkeeping exactly: an EOS
  at t=0 is rewritten to UNK, positions after EOS emit PAD, and the emitted
  (post-rewrite) token is fed back as the next input (greedy:98-107).
* ``run_sample`` is the categorical-sampling variant (sample:31-58), with the
  forced-EOS final step.
* ``run_beam`` is a vectorized batch x width beam that reproduces the
  reference's ``Node``-fringe semantics exactly — EOS retirement with
  fringe refill, ``-log(p + 1e-10)`` costs, ``cum_cost / length`` final
  selection, and the stable-sort tie-breaking — see its docstring. Parity
  vs the imported reference beam at width 2-3 is enforced by
  ``tests/test_reference_parity_beam.py``.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

StepFn = Callable[[object, jnp.ndarray], Tuple[jnp.ndarray, object]]


def validate_controls(temperature: float, top_k: int, top_p: float) -> None:
    """Shared range checks for sampling controls (device pipeline and the
    serving CLI's per-request validation stay in lockstep)."""
    if temperature <= 0.0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    if not 0.0 < top_p <= 1.0:
        raise ValueError(f"top_p must be in (0, 1], got {top_p}")
    if top_k < 0:
        raise ValueError(f"top_k must be >= 0, got {top_k}")


def sampling_controls(logits: jnp.ndarray, temperature: float = 1.0,
                      top_k: int = 0, top_p: float = 1.0) -> jnp.ndarray:
    """Standard sampling controls on [B, V] f32 logits (all opt-in; the
    defaults are identity). Order: temperature -> top-k -> nucleus (top-p),
    masked positions set to -inf. The reference has no sampling controls
    (its sampler is plain Categorical — common/Utils.py:90-95), so this is
    a capability extension, gated off by default for parity."""
    validate_controls(temperature, top_k, top_p)
    neg = jnp.asarray(-1e30, logits.dtype)
    if temperature != 1.0:
        logits = logits / jnp.asarray(temperature, logits.dtype)
    if top_k > 0 and top_k < logits.shape[-1]:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, neg, logits)
    if top_p < 1.0:
        v = logits.shape[-1]
        sorted_logits, sorted_idx = jax.lax.top_k(logits, v)   # descending
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens whose cumulative mass BEFORE them is < top_p
        # (always keeps the most-probable token)
        keep_sorted = (cum - probs) < top_p
        keep = jnp.zeros(logits.shape, bool)
        rows = jnp.arange(logits.shape[0])[:, None]
        keep = keep.at[rows, sorted_idx].set(keep_sorted)
        logits = jnp.where(keep, logits, neg)
    return logits


def sampling_controls_rows(logits: jnp.ndarray, temperature: jnp.ndarray,
                           top_k: jnp.ndarray, top_p: jnp.ndarray
                           ) -> jnp.ndarray:
    """Per-ROW sampling controls on [B, V] f32 logits: the same
    temperature -> top-k -> nucleus pipeline as ``sampling_controls`` but
    with [B] control vectors, so every decode row can carry its own
    request's controls (continuous serving: runtime/continuous.py). A row
    with (1.0, 0, 1.0) is identity; otherwise the row matches
    ``sampling_controls(logits[r:r+1], *controls[r])`` exactly — one
    shared descending sort serves both the top-k threshold and the
    nucleus mask (values below the k-th largest form a suffix of the
    sorted order, so masking them in place equals sort-after-mask).
    Controls are validated host-side by the caller (featurize time)."""
    b, v = logits.shape
    logits = logits / temperature[:, None].astype(logits.dtype)
    neg = jnp.asarray(-1e30, logits.dtype)
    sorted_logits, sorted_idx = jax.lax.top_k(logits, v)   # descending
    k_eff = jnp.clip(top_k, 1, v)
    kth = jnp.take_along_axis(sorted_logits, (k_eff - 1)[:, None], axis=-1)
    cut_k = (top_k > 0)[:, None] & (sorted_logits < kth)
    sl = jnp.where(cut_k, neg, sorted_logits)
    probs = jax.nn.softmax(sl, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # top_p >= 1 is identity (sampling_controls skips the branch — the
    # explicit OR avoids dropping the smallest token to float residue)
    keep_sorted = ((cum - probs) < top_p[:, None]) | (top_p >= 1.0)[:, None]
    keep_sorted &= ~cut_k
    rows = jnp.arange(b)[:, None]
    keep = jnp.zeros((b, v), bool).at[rows, sorted_idx].set(keep_sorted)
    return jnp.where(keep, logits, neg)


def _greedy_loop(pick_fn, init_state, batch_size: int, max_len: int,
                 bos: int, eos: int, unk: int, pad: int,
                 early_exit: bool) -> jnp.ndarray:
    """Shared greedy driver: ``pick_fn(state, prev) -> (idx [B], state)``
    chooses the next token; this applies the reference's EOS bookkeeping."""
    def body(carry, t):
        state, prev, ended = carry
        idx, state = pick_fn(state, prev)
        this_end = idx == eos
        idx = jnp.where((t == 0) & this_end, unk, idx)
        idx = jnp.where((t > 0) & ended, pad, idx)
        ended = ended | this_end
        return (state, idx, ended), idx

    prev0 = jnp.full((batch_size,), bos, jnp.int32)
    ended0 = jnp.zeros((batch_size,), bool)

    if not early_exit:
        _, ids = jax.lax.scan(body, (init_state, prev0, ended0),
                              jnp.arange(max_len))
        return ids.T  # [B, T]

    out0 = jnp.zeros((batch_size, max_len), jnp.int32)

    def cond(c):
        t, _, _, ended, _ = c
        return (t < max_len) & ~jnp.all(ended)

    def wbody(c):
        t, state, prev, ended, out = c
        (state, idx, ended), _ = body((state, prev, ended), t)
        out = jax.lax.dynamic_update_slice(out, idx[:, None], (0, t))
        return (t + 1, state, idx, ended, out)

    _, _, _, _, out = jax.lax.while_loop(
        cond, wbody, (jnp.int32(0), init_state, prev0, ended0, out0))
    return out


def run_greedy(step_fn: StepFn, init_state, batch_size: int, max_len: int,
               bos: int, eos: int, unk: int, pad: int = 0,
               early_exit: bool = False) -> jnp.ndarray:
    """Greedy loop with the reference's EOS bookkeeping.

    ``early_exit=True`` switches to a ``while_loop`` that stops once every
    row has emitted EOS. Emitted sentences are identical (positions past a
    row's EOS are PAD either way); only wall-clock changes.
    """
    def pick(state, prev):
        scores, state = step_fn(state, prev)
        return jnp.argmax(scores, axis=-1).astype(jnp.int32), state

    return _greedy_loop(pick, init_state, batch_size, max_len, bos, eos,
                        unk, pad, early_exit)


def run_greedy_copy(fast_fn, src_ids: jnp.ndarray, init_state,
                    batch_size: int, max_len: int,
                    bos: int, eos: int, unk: int, pad: int = 0,
                    early_exit: bool = False) -> jnp.ndarray:
    """Greedy loop over a copy-mixture step WITHOUT the [B, V] scatter.

    ``fast_fn(state, prev) -> (logits [B, V], l_at [B, L], gate, cw [B, L],
    state)``: the pre-softmax vocabulary logits, those logits gathered at
    the (step-invariant) source ids via hoisted weight columns, the gate on
    the softmax branch, and the gate-scaled copy mass, such that the step
    distribution is ``gate*softmax(logits) + scatter_add(cw, src_ids)``.
    The next token comes from ``candidate_argmax_from_logits`` (the
    per-step [B, V] scatter — and the [B, V] gather a naive candidate
    argmax pays — are the largest single decode ops at B=64; docs/PERF.md
    rounds 4-6). Same EOS bookkeeping as ``run_greedy``.
    """
    from ..kernels.copy_argmax import candidate_argmax_from_logits

    def pick(state, prev):
        logits, l_at, gate, cw, state = fast_fn(state, prev)
        return candidate_argmax_from_logits(logits, l_at, gate, cw,
                                            src_ids), state

    return _greedy_loop(pick, init_state, batch_size, max_len, bos, eos,
                        unk, pad, early_exit)


def run_sample(step_fn: StepFn, init_state, batch_size: int, max_len: int,
               bos: int, eos: int, unk: int, pad: int, rng: jax.Array,
               temperature: float = 1.0, top_k: int = 0, top_p: float = 1.0
               ) -> jnp.ndarray:
    """Categorical sampling over softmax(scores) with the reference's
    bookkeeping (sample:47-58): last step forces EOS (or PAD if ended).

    With any control set (temperature/top_k/top_p), sampling switches to
    the STANDARD distribution — ``categorical(controls(log_softmax))`` —
    instead of the reference's double-softmax quirk below; the defaults
    keep the quirk for parity."""
    controlled = temperature != 1.0 or top_k > 0 or top_p < 1.0

    def body(carry, inp):
        t, key = inp
        state, prev, ended = carry
        scores, state = step_fn(state, prev)
        if controlled:
            logits = sampling_controls(
                jax.nn.log_softmax(scores.astype(jnp.float32), axis=-1),
                temperature, top_k, top_p)
            idx = jax.random.categorical(key, logits).astype(jnp.int32)
        else:
            # NB: the reference double-softmaxes — Generations.py:41 applies
            # F.softmax to the model scores and Categorical(logits=...) then
            # softmaxes again (common/Utils.py:90-95). Reproduced by
            # softmaxing once here and letting categorical() apply the
            # second.
            idx = jax.random.categorical(key, jax.nn.softmax(scores, axis=-1)
                                         ).astype(jnp.int32)
        this_end = idx == eos
        idx = jnp.where((t == 0) & this_end, unk, idx)
        idx = jnp.where(t == max_len - 1, eos, idx)
        idx = jnp.where((t > 0) & ended, pad, idx)
        ended = ended | this_end
        return (state, idx, ended), idx

    keys = jax.random.split(rng, max_len)
    prev0 = jnp.full((batch_size,), bos, jnp.int32)
    ended0 = jnp.zeros((batch_size,), bool)
    _, ids = jax.lax.scan(body, (init_state, prev0, ended0),
                          (jnp.arange(max_len), keys))
    return ids.T


def run_beam(step_fn: StepFn, init_state, batch_size: int, max_len: int,
             width: int, bos: int, eos: int, pad: int = 0,
             eps: float = 1e-10) -> jnp.ndarray:
    """Reference-exact beam search, vectorized over batch*width.

    Reproduces ``common/Generations.py:112-190`` (``beam``/``Node``)
    including its retirement semantics and tie-breaking:

    * A beam whose newest token is EOS **retires** into the per-sample
      results at the start of the next step (beam:139-141); the fringe then
      refills to ``width`` from the surviving parents' expansions.
      (Considering all V children per parent is selection-equivalent to the
      reference's per-parent top-``width`` (to_word at beam:160): any child
      in the global top ``width`` is within its parent's top ``width``.)
    * Token cost ``-log(p + 1e-10)`` (beam:170). Fringe selection sorts by
      ``cum_cost/length`` (beam:180), but all alive beams at a step share
      one length, so raw cumulative cost gives the identical order — the
      normalization only decides the FINAL winner among retirees of
      different lengths (beam:184, length counts the BOS root).
    * Tie-breaking: the reference's stable sort enumerates children in
      (fringe position, per-parent topk rank) order; ``lax.top_k`` on the
      flattened [parent, token] axis picks lower indices on ties, which is
      the same order. Among retirees, earlier steps win ties (results are
      appended then stably sorted) — reproduced by strict-< best updates,
      with ``argmin``'s first-minimum giving fringe order within a step.

    ``init_state`` must already be tiled to batch*width (use
    ``tile_state``); ``step_fn`` sees flattened [B*W] token batches and must
    emit probabilities. Returns the winning sequences [B, max_len], PAD
    after EOS (the EOS itself is emitted, as in the reference's
    ``to_sequence_of_values()[1:]``).
    """
    inf = jnp.asarray(jnp.inf, jnp.float32)
    b_ar = jnp.arange(batch_size)

    def harvest(best_norm, best_tok, norm_r, toks):
        """Fold retirees (norm_r [B,W], inf where not retiring) into the
        running best. First-minimum argmin = fringe order; strict < keeps
        earlier retirees on ties."""
        cand = jnp.min(norm_r, axis=1)
        idx = jnp.argmin(norm_r, axis=1)
        better = cand < best_norm
        best_norm = jnp.where(better, cand, best_norm)
        best_tok = jnp.where(better[:, None], toks[b_ar, idx], best_tok)
        return best_norm, best_tok

    def body(carry, t):
        state, prev, cum, alive, toks, best_norm, best_tok = carry

        # --- retire EOS-ended beams (beam:139-141, results append) ---
        prev_b = prev.reshape(batch_size, width)
        newly = alive & (prev_b == eos) & (t > 0)
        norm_r = jnp.where(newly, cum / (t + 1.0), inf)
        best_norm, best_tok = harvest(best_norm, best_tok, norm_r, toks)
        alive = alive & ~newly
        any_alive = jnp.any(alive, axis=1)          # fringe non-empty?

        # --- expand the fringe (beam:154-180) ---
        scores, state = step_fn(state, prev)        # [B*W, V] probabilities
        v = scores.shape[-1]
        cost = -jnp.log(jnp.maximum(scores, 0.0) + eps)
        cand = cum[:, :, None] + cost.reshape(batch_size, width, v)
        cand = jnp.where(alive[:, :, None], cand, inf)
        # first step: the reference fringe holds ONE root per sample
        cand = jnp.where((t == 0) & (jnp.arange(width)[None, :, None] > 0),
                         inf, cand)
        flat = cand.reshape(batch_size, width * v)
        neg_cum, top_idx = jax.lax.top_k(-flat, width)
        beam_idx = top_idx // v
        tok = (top_idx % v).astype(jnp.int32)

        new_toks = jnp.take_along_axis(toks, beam_idx[:, :, None], axis=1)
        new_toks = new_toks.at[:, :, t].set(tok)

        # samples with an empty fringe freeze (reference breaks the loop)
        keep = any_alive[:, None]
        cum = jnp.where(keep, -neg_cum, cum)
        toks = jnp.where(keep[:, :, None], new_toks, toks)
        alive = jnp.broadcast_to(any_alive[:, None], (batch_size, width))
        prev = jnp.where(keep, tok, prev_b).reshape(-1)
        state = jax.tree_util.tree_map(
            lambda s: _reindex_state(s, beam_idx, batch_size, width), state)
        return (state, prev, cum, alive, toks, best_norm, best_tok), ()

    prev0 = jnp.full((batch_size * width,), bos, jnp.int32)
    cum0 = jnp.zeros((batch_size, width), jnp.float32)
    alive0 = jnp.ones((batch_size, width), bool)
    toks0 = jnp.full((batch_size, width, max_len), pad, jnp.int32)
    best_norm0 = jnp.full((batch_size,), jnp.inf, jnp.float32)
    best_tok0 = jnp.full((batch_size, max_len), pad, jnp.int32)

    (_, prev, cum, alive, toks, best_norm, best_tok), _ = jax.lax.scan(
        body, (init_state, prev0, cum0, alive0, toks0, best_norm0,
               best_tok0), jnp.arange(max_len))

    # final retirement at l == max_len (beam:139: ``or l == max_len``):
    # every still-alive beam retires with length max_len + 1
    norm_f = jnp.where(alive, cum / (max_len + 1.0), inf)
    best_norm, best_tok = harvest(best_norm, best_tok, norm_f, toks)
    return best_tok


def _reindex_state(s: jnp.ndarray, beam_idx: jnp.ndarray, b: int, w: int):
    """Gather state rows (laid out [B*W, ...]) by per-sample beam indices."""
    rest = s.shape[1:]
    s = s.reshape((b, w) + rest)
    idx = beam_idx.reshape((b, w) + (1,) * len(rest))
    idx = jnp.broadcast_to(idx, (b, w) + rest)
    return jnp.take_along_axis(s, idx, axis=1).reshape((b * w,) + rest)


def tile_state(state, width: int):
    """Repeat every state leaf along batch: [B, ...] -> [B*W, ...]."""
    return jax.tree_util.tree_map(
        lambda s: jnp.repeat(s, width, axis=0), state)

"""Prediction wrappers: greedy / beam / sample over the EncDec step protocol.

Replaces the reference's EncDecModel.greedy/beam dispatch
(S2SA/EncDecModel.py:38-42 -> common/Generations.py). Models expose

    encode(batch)                  -> enc pytree (everything the step needs)
    decode_step(enc, state, prev)  -> (scores [B, V*], new_state)

and these wrappers drive the jit-able scan loops from decode/loops.py.
"""

from __future__ import annotations

from typing import Dict

import functools

import jax
import jax.numpy as jnp

from ..decode.loops import run_beam, run_greedy, run_sample, tile_state


def _enc_and_state(model, params, batch, enc=None):
    if enc is None:
        enc = model.apply(params, batch, method=type(model).encode)
    state = enc["init_state"]
    return enc, state


def greedy_predict(model, params, batch: Dict[str, jnp.ndarray],
                   max_len: int, early_exit: bool = False,
                   enc=None, fast_copy: bool | None = None) -> jnp.ndarray:
    """``fast_copy``: scatter-free candidate argmax for copy models (GLKS /
    GTTP expose ``decode_step_fast``). Default (None = auto) stays OFF:
    unlike the transformer-stack multi-memory decoders (where the same
    candidate path wins ~12-17% e2e — models/multimem.py decode), the GRU
    copy models LOSE with it (glks 1861 -> 1529 qps at B=64 bf16: their
    decode step is small, so the per-step [B, Lb, d] hoisted-column einsum
    read outweighs the scatter it removes — docs/PERF.md round 6).
    ``fast_copy=True`` forces it (equivalence-tested, exact up to rounding
    and tie-breaks)."""
    cfg = model.cfg
    enc, state = _enc_and_state(model, params, batch, enc)
    b = batch["response"].shape[0] if "response" in batch else batch["context"].shape[0]

    has_fast = hasattr(type(model), "decode_step_fast")
    try:
        from ..kernels import copy_argmax as _ca
        pallas_ok = _ca.pallas_available()
    except Exception:  # pragma: no cover
        pallas_ok = False
    if fast_copy is None:
        fast_copy = False
    if fast_copy and has_fast and pallas_ok:
        from ..decode.loops import run_greedy_copy

        fast_ctx = model.apply(params, enc,
                               method=type(model).prepare_fast_decode)

        def fast_step(state, prev):
            return model.apply(params, enc, fast_ctx, state, prev,
                               method=type(model).decode_step_fast)

        return run_greedy_copy(fast_step, enc["background"], state, b,
                               max_len, cfg.bos_id, cfg.eos_id, cfg.unk_id,
                               cfg.pad_id, early_exit=early_exit)

    def step(state, prev):
        scores, state = model.apply(params, enc, state, prev,
                                    method=type(model).decode_step)
        return scores, state

    return run_greedy(step, state, b, max_len, cfg.bos_id, cfg.eos_id,
                      cfg.unk_id, cfg.pad_id, early_exit=early_exit)


def continuous_decode_init(model, batch, *, max_len: int, fast_argmax=None):
    """Chunk-decode state for the EncDec-protocol models (continuous
    serving — runtime/continuous.py; the multimem models have their own
    decode_init). Returns (state, rank-or-None). Flax ``method=`` target:
    first arg is the module. ``fast_argmax`` accepted for driver symmetry
    (the protocol models' auto gate keeps the dense step —
    greedy_predict docstring)."""
    del fast_argmax
    cfg = model.cfg
    enc = model.encode(batch)
    b = jax.tree_util.tree_leaves(enc["init_state"])[0].shape[0]
    cap = batch.get("response_cap")
    state = {
        "enc": enc, "dec": enc["init_state"],
        "prev": jnp.full((b,), cfg.bos_id, jnp.int32),
        "trow": jnp.zeros((b,), jnp.int32),
        "done": jnp.zeros((b,), bool),
        "out": jnp.full((b, max_len), cfg.pad_id, jnp.int32),
        "row_max": jnp.full((b,), max_len, jnp.int32) if cap is None
        else jnp.clip(cap.astype(jnp.int32), 1, max_len),
    }
    if batch.get("sample_key") is not None:
        # per-row PRNG key data for sampled continuous decoding: the key
        # rides with the row, step key = fold_in(row_key, trow) — sampled
        # tokens are reproducible per request regardless of batch
        # composition/refill timing (multimem.chunk_init docstring)
        state["keys"] = batch["sample_key"].astype(jnp.uint32)
    if batch.get("sample_ctl") is not None:
        # per-row (temperature, top_k, top_p) — each request's sampling
        # controls ride with its row (sampling_controls_rows)
        state["ctl"] = batch["sample_ctl"].astype(jnp.float32)
    rank = enc["ck_attn"] if "ck_attn" in enc else None
    return state, rank


def continuous_decode_chunk(model, state, *, n_steps: int, fast_argmax=None,
                            sampling: bool = False, temperature: float = 1.0,
                            top_k: int = 0, top_p: float = 1.0):
    """Advance non-done rows by ``n_steps`` decode steps with the
    reference's EOS bookkeeping (an EOS at a row's step 0 is rewritten to
    UNK but still ends the row; positions past EOS stay PAD —
    decode/loops._greedy_loop). Row-independent, so per-request tokens
    equal the one-shot run_greedy output exactly.

    ``sampling=True`` mirrors ``run_greedy``'s sibling ``run_sample``
    instead: uncontrolled sampling keeps the reference's double-softmax
    quirk, any control switches to categorical(controls(log_softmax)),
    and the row's last step forces EOS. Step keys come from the state's
    per-row ``keys`` via fold_in(row_key, trow), so sampled tokens are
    reproducible per request regardless of batch composition (top_k=1 is
    bit-identical to the batch ``sample_predict`` path — tests)."""
    del fast_argmax
    cfg = model.cfg
    eos, unk = cfg.eos_id, cfg.unk_id
    enc = state["enc"]
    b, max_len = state["out"].shape
    row_max = state["row_max"]
    per_row = getattr(type(model), "STEP_PER_ROW", False)
    rows = jnp.arange(b)
    if sampling:
        from ..decode.loops import sampling_controls, sampling_controls_rows
        controlled = temperature != 1.0 or top_k > 0 or top_p < 1.0
        # per-row keys are ALWAYS threefry key data ([B, 2] uint32): pin
        # the impl so the per-request reproducibility contract survives a
        # different global default (e.g. --fast_rng's rbg dropout stream)
        wrap = functools.partial(jax.random.wrap_key_data,
                                 impl="threefry2x32")
        row_keys = jax.vmap(wrap)(state["keys"])
        ctl = state.get("ctl")

    def body(carry, _):
        dec, prev, trow, done, out = carry
        if per_row:
            scores, dec = model.decode_step(enc, dec, prev, per_row=True)
        else:
            scores, dec = model.decode_step(enc, dec, prev)
        if sampling:
            keys_t = jax.vmap(jax.random.fold_in)(row_keys, trow)
            if ctl is not None:
                # per-request controls: always the standard controlled
                # distribution (a default-controls row samples from the
                # true softmax, not the double-softmax quirk)
                logits = sampling_controls_rows(
                    jax.nn.log_softmax(scores.astype(jnp.float32), axis=-1),
                    ctl[:, 0], ctl[:, 1].astype(jnp.int32), ctl[:, 2])
            elif controlled:
                logits = sampling_controls(
                    jax.nn.log_softmax(scores.astype(jnp.float32), axis=-1),
                    temperature, top_k, top_p)
            else:
                # reference double-softmax quirk (run_sample:172-179)
                logits = jax.nn.softmax(scores, axis=-1)
            idx = jax.vmap(jax.random.categorical)(keys_t, logits
                                                   ).astype(jnp.int32)
        else:
            idx = jnp.argmax(scores, axis=-1).astype(jnp.int32)
        raw_end = idx == eos
        idx = jnp.where((trow == 0) & raw_end, unk, idx)
        if sampling:   # run_sample forces EOS at the row's last step
            idx = jnp.where(trow >= row_max - 1, eos, idx)
        active = ~done
        out = out.at[rows, jnp.where(active, trow, max_len)].set(
            idx, mode="drop")
        newly = active & (raw_end | (trow >= row_max - 1))
        prev = jnp.where(active, idx, prev)
        trow = jnp.where(active & ~newly, trow + 1, trow)
        return (dec, prev, trow, done | newly, out), ()

    carry = (state["dec"], state["prev"], state["trow"], state["done"],
             state["out"])
    carry, _ = jax.lax.scan(body, carry, None, length=n_steps)
    dec, prev, trow, done, out = carry
    return dict(state, dec=dec, prev=prev, trow=trow, done=done, out=out)


def beam_predict(model, params, batch: Dict[str, jnp.ndarray], max_len: int,
                 width: int) -> jnp.ndarray:
    cfg = model.cfg
    enc, state = _enc_and_state(model, params, batch)
    b = state.shape[0] if hasattr(state, "shape") else jax.tree_util.tree_leaves(state)[0].shape[0]
    enc = tile_state(enc, width)
    state = tile_state(state, width)

    def step(state, prev):
        scores, state = model.apply(params, enc, state, prev,
                                    method=type(model).decode_step)
        # Beam costs are -log(score + 1e-10) on whatever ``generate(...,
        # softmax=True)`` returns in the reference (Generations.py:158-170).
        # GTTP/GLKS emit mixture probabilities (STEP_EMITS_PROBS); S2SA's
        # generate IGNORES the softmax flag (S2SA/Model.py:98-99) so its
        # reference beam runs on RAW logits — reproduced here for parity
        # (where a top-width logit is negative the reference raises
        # ``math domain error``; we clamp to eps-cost instead). TMemNet's
        # reference beam cannot run (decode arity, SURVEY §4), so it gets
        # the standard probability-domain cost.
        if getattr(type(model), "STEP_EMITS_PROBS", False) or \
                getattr(type(model), "BEAM_RAW_SCORES", False):
            probs = scores
        else:
            probs = jax.nn.softmax(scores, axis=-1)
        return probs, state

    return run_beam(step, state, b, max_len, width, cfg.bos_id, cfg.eos_id,
                    cfg.pad_id)


def sample_predict(model, params, batch, max_len: int, rng,
                   enc=None, temperature: float = 1.0, top_k: int = 0,
                   top_p: float = 1.0) -> jnp.ndarray:
    cfg = model.cfg
    enc, state = _enc_and_state(model, params, batch, enc)
    b = jax.tree_util.tree_leaves(state)[0].shape[0]

    def step(state, prev):
        scores, state = model.apply(params, enc, state, prev,
                                    method=type(model).decode_step)
        return scores, state

    return run_sample(step, state, b, max_len, cfg.bos_id, cfg.eos_id,
                      cfg.unk_id, cfg.pad_id, rng,
                      temperature=temperature, top_k=top_k, top_p=top_p)

"""Continuous batching for greedy serving (CaSE/Masque).

The fixed-length batch decode wastes steps: a row that emits EOS at step
12 still rides the remaining ``max_len - 12`` steps (early-exit only stops
once EVERY row finished — the expected batch cost is the MAX of the rows'
answer lengths, ~max_len at B=64). Here rows progress independently:
finished rows are harvested between chunks of ``chunk_steps`` decode steps
and their slots refilled with newly arrived requests mid-flight, so batch
cost tracks the MEAN answer length instead.

TPU-native shape discipline: the decode state is a pytree of fixed-shape
[B, ...] arrays (per-row step indices, caches, cross K/V, copy operands —
models/multimem.py chunk_init/chunk_step); refilling is a row scatter of a
freshly encoded (smaller, fixed ``refill`` bucket) state into the live
one. Greedy decode math is row-independent, so per-request answers are
bit-identical to the one-shot ``predict`` path regardless of batch
composition (tests/test_continuous.py).

The reference has no serving path at all (its closest analogue is the
fixed-batch offline predict, common/CumulativeTrainer.py:134-156).
"""

from __future__ import annotations

from typing import Callable, Dict, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


def refill_rows(state, new_state, rows):
    """Scatter ``new_state``'s rows into ``state`` at ``rows``.

    ``rows`` has ``new_state``'s batch size; entries >= state's batch size
    are dropped (padding slots of a part-filled refill bucket)."""
    def sc(s, n):
        return s.at[rows].set(n, mode="drop")
    return jax.tree_util.tree_map(sc, state, new_state)


def make_continuous_fns(model, max_len: int, chunk_steps: int,
                        fast_argmax: Optional[bool] = None):
    """(init_fn, chunk_fn, refill_fn), all jitted.

    init_fn(variables, batch) -> (state, rank); chunk_fn(variables, state)
    advances every live row by ``chunk_steps``; refill_fn(state,
    new_state, rows) scatters fresh rows in."""
    mt = type(model)

    def init_fn(variables, batch):
        return model.apply(variables, batch, max_len=max_len,
                           fast_argmax=fast_argmax, method=mt.decode_init)

    def chunk_fn(variables, state):
        return model.apply(variables, state, n_steps=chunk_steps,
                           fast_argmax=fast_argmax, method=mt.decode_chunk)

    def refill_fn(state, new_state, rows):
        return refill_rows(state, new_state, rows)

    return jax.jit(init_fn), jax.jit(chunk_fn), jax.jit(refill_fn)


def run_continuous(requests: Iterator[dict],
                   make_batch: Callable[[List[dict], int], Dict[str, np.ndarray]],
                   init_fn, chunk_fn, refill_fn, variables,
                   batch_size: int, refill: int,
                   emit: Callable[[dict, np.ndarray, np.ndarray], None],
                   max_len: int) -> Dict[str, int]:
    """Drive the continuous decode loop over a request stream.

    ``make_batch(chunk, bs)`` featurizes up to ``bs`` requests into a
    fixed-``bs`` batch (padding rows repeat). ``emit(req, ids_row,
    rank_row)`` receives each finished request IN ARRIVAL ORDER (reorder
    buffer). Returns counters (requests served, chunks run, decode steps,
    refills) for observability."""
    b = batch_size
    refill = max(1, min(refill, b))
    pending: List[dict] = []
    req_iter = iter(requests)
    exhausted = False

    def take(n: int) -> List[dict]:
        nonlocal exhausted
        while len(pending) < n and not exhausted:
            try:
                pending.append(next(req_iter))
            except StopIteration:
                exhausted = True
        out = pending[:n]
        del pending[:n]
        return out

    # arrival-order reorder buffer
    next_emit = 0
    held: Dict[int, tuple] = {}

    def finish(idx: int, req: dict, ids: np.ndarray, rank: np.ndarray):
        nonlocal next_emit
        held[idx] = (req, ids, rank)
        while next_emit in held:
            r, i, k = held.pop(next_emit)
            emit(r, i, k)
            next_emit += 1

    # slots[r] = (arrival_idx, request, rank_row) or None (free/dummy)
    slots: List[Optional[tuple]] = [None] * b
    arrival = 0
    stats = {"served": 0, "chunks": 0, "refills": 0}

    first = take(b)
    if not first:
        return stats
    state, rank = init_fn(variables, make_batch(first, b))
    rank_h = np.asarray(jax.device_get(rank))
    for i, req in enumerate(first):
        slots[i] = (arrival, req, rank_h[i])
        arrival += 1

    while any(s is not None for s in slots):
        state = chunk_fn(variables, state)
        stats["chunks"] += 1
        done = np.asarray(jax.device_get(state["done"]))
        finished = [r for r in range(b) if slots[r] is not None and done[r]]
        if finished:
            out = np.asarray(jax.device_get(state["out"]))
            for r in finished:
                idx, req, rk = slots[r]
                finish(idx, req, out[r], rk)
                slots[r] = None
                stats["served"] += 1
        free = [r for r in range(b) if slots[r] is None]
        if free and (pending or not exhausted):
            newreqs = take(min(len(free), refill))
            if newreqs:
                k = len(newreqs)
                new_state, new_rank = init_fn(variables,
                                              make_batch(newreqs, refill))
                rows = np.asarray(free[:k] + [b] * (refill - k), np.int32)
                state = refill_fn(state, new_state, jnp.asarray(rows))
                nr = np.asarray(jax.device_get(new_rank))
                for i, req in enumerate(newreqs):
                    slots[free[i]] = (arrival, req, nr[i])
                    arrival += 1
                stats["refills"] += 1
    return stats

"""Single-lane continuous-batching driver (``run_continuous``).
See the package docstring for the design overview; the jitted program
builders and request sources live in ``base``.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .base import IterSource, _LazyRank

def run_continuous(source,
                   make_batch: Callable[[List[dict], int], Dict[str, np.ndarray]],
                   init_fn, chunk_fn, refill_fn, variables,
                   batch_size: int, refill: int,
                   emit: Callable[[dict, np.ndarray, np.ndarray], None],
                   max_len: int, ordered: bool = True,
                   on_chunk: Optional[Callable[[int], None]] = None,
                   lookahead: bool = False,
                   stream_cb: Optional[Callable] = None,
                   refill_min: int = 1,
                   async_harvest: bool = False) -> Dict[str, int]:
    """Drive the continuous decode loop over a request source.

    ``source`` is an ``IterSource``/``QueueSource`` (a plain iterator is
    wrapped). ``make_batch(chunk, bs)`` featurizes up to ``bs`` requests
    into a fixed-``bs`` batch (padding rows repeat); returning ``None``
    drops that chunk (the caller already reported the failure).
    ``emit(req, ids_row, rank_row)`` receives finished requests — in
    arrival order when ``ordered`` (offline files), immediately on
    completion otherwise (HTTP waiters). ``on_chunk(chunks_so_far)`` is
    called after every chunk (live /varz stats). Returns counters
    (requests served, chunks run, refills) for observability.

    ``lookahead=True`` keeps one chunk dispatched ahead: the harvest's
    device fetch overlaps the NEXT chunk's compute (hides the host
    roundtrip), at the cost of refills landing one chunk later and a
    non-donated (double-buffered) state — build the fns with
    ``donate_state=False``. Emitted results are identical.

    ``stream_cb(host, slots)`` is called after every chunk, BEFORE the
    harvest, with ``host`` = {"out": np [B, max_len], "trow": np [B]} —
    already-fetched HOST arrays (fetched together with ``done`` in the
    round's single device_get, so streaming adds zero extra roundtrips).
    The callback pushes per-row token deltas to live clients; ``slots[r]``
    is ``(arrival_idx, request, rank)`` or None. A finished row's final
    ``emit`` always follows its last delta on the same thread.

    ``refill_min`` coalesces refills: free rows accumulate until at least
    ``min(refill_min, refill)`` are free before a mid-flight refill runs.
    Each refill pays a fixed-width (``refill``-row) encode regardless of
    how many rows it actually fills, so eager refilling of 1-2 rows per
    chunk wastes encode FLOPs and a host roundtrip; coalescing trades a
    little occupancy for refills that arrive ~full. 1 (default) keeps the
    old eager behavior. Free rows are retired either way, so coalescing
    never deadlocks — rows keep finishing until the threshold is met.

    ``async_harvest=True`` pipelines the flag fetch itself: flags ride a
    ``copy_to_host_async`` started when their chunk is dispatched and are
    read one round later (landed during a full round of device compute,
    so the read is ~free — no blocking roundtrip between chunks).
    Refilled slots are protected by snapshot identity: a row whose slot
    changed since its flags were copied is skipped (the stale done flag
    refers to the already-emitted previous request). Emitted results are
    identical either way. Two round orders, picked by ``lookahead``:

    * ``lookahead=True`` — dispatch-first: the next chunk is dispatched
      BEFORE harvesting, so the device computes through the host's
      harvest + featurize + refill work (refills land in the dispatched-
      ahead state). Finish->reuse lag is 2-3 chunks, but on a high-RTT
      relay-attached chip the overlap dominates (measured 591 vs 316 qps
      at chunk=8 — docs/PERF.md round 10). Needs non-donating fns.
    * ``lookahead=False`` — harvest-first: read the landed flags, refill
      freed slots into the CURRENT state, then dispatch. One-chunk lag
      and donation-safe (every buffer is read before the refill/chunk
      that consumes it), but the device idles during host refill work —
      the right order on a locally-attached (sub-ms RTT) chip."""
    b = batch_size
    refill = max(1, min(refill, b))
    refill_min = max(1, min(refill_min, refill))
    if not hasattr(source, "take"):
        source = IterSource(source)

    # arrival-order reorder buffer (ordered mode)
    next_emit = 0
    held: Dict[int, tuple] = {}

    def finish(idx: int, req: dict, ids: np.ndarray, rank: np.ndarray):
        nonlocal next_emit
        if not ordered:
            emit(req, ids, rank)
            return
        held[idx] = (req, ids, rank)
        while next_emit in held:
            r, i, k = held.pop(next_emit)
            emit(r, i, k)
            next_emit += 1

    # slots[r] = (arrival_idx, request, rank_row_device) or None (free)
    slots: List[Optional[tuple]] = [None] * b
    arrival = 0
    stats = {"served": 0, "chunks": 0, "refills": 0}
    state = None     # the state whose done/out the next harvest reads
    pending = None   # lookahead: one chunk already dispatched from `state`
    inflight = None  # async_harvest: (flag handles, slots snapshot)

    def fill(rows: List[int], wait: bool) -> bool:
        """Take up to ``refill`` (or b, at cold start) requests and
        scatter them into ``rows``; returns True if any were added.
        In lookahead mode the scatter targets the already-dispatched
        ``pending`` state (the one future chunks grow from)."""
        nonlocal state, pending, arrival
        width = b if state is None else refill
        newreqs = source.take(min(len(rows), width), wait)
        if not newreqs:
            return False
        k = len(newreqs)
        batch = make_batch(newreqs, width)
        if batch is None:   # featurize failure — caller reported it
            return False
        if state is None:
            state, rank = init_fn(variables, batch)
            pending = None
        else:
            new_state, rank = init_fn(variables, batch)
            idx = jnp.asarray(
                np.asarray(rows[:k] + [b] * (width - k), np.int32))
            if lookahead and pending is not None:
                pending = refill_fn(pending, new_state, idx)
            else:
                state = refill_fn(state, new_state, idx)
            stats["refills"] += 1
        # rank rides as a lazy async-copy handle: fetching it here would
        # block a host roundtrip per refill; requests read it chunks
        # later, when they finish (_LazyRank resolves once per bucket).
        # SAFE ACROSS DONATION: for EncDec models ``rank`` is the same
        # traced value as state['enc']['ck_attn'] (models/predict.py:108),
        # and later chunk_fn calls donate the state — jit materializes
        # duplicated outputs as DISTINCT buffers, so this handle survives
        # the donation (regression-guarded:
        # tests/test_continuous.py::test_lazy_rank_survives_donating_chunk)
        lazy = None if rank is None else _LazyRank(rank)
        for i, req in enumerate(newreqs):
            slots[rows[i]] = (arrival, req,
                              None if lazy is None else (lazy, i))
            arrival += 1
        return True

    if async_harvest and not lookahead:
        # harvest-first round order: read last round's landed flag copy,
        # refill the freed slots into the CURRENT state, dispatch, start
        # the next flag copy. No blocking device wait anywhere in the
        # round; finished slots are reusable one chunk after their flags
        # land. (The dispatch-first order for relay-attached chips is the
        # lookahead branch below.)
        while True:
            if inflight is not None:
                h, snap = inflight
                inflight = None
                fetched = tuple(np.asarray(x) for x in jax.device_get(h))
                done, out = fetched[0], fetched[1]
                live = [snap[r] if (snap[r] is not None
                                    and snap[r] is slots[r]) else None
                        for r in range(b)]
                if stream_cb is not None:
                    stream_cb({"out": out, "trow": fetched[2]}, live)
                for r in range(b):
                    if live[r] is not None and done[r]:
                        idx, req, rk = slots[r]
                        finish(idx, req, out[r],
                               None if rk is None else rk[0].row(rk[1]))
                        slots[r] = None
                        stats["served"] += 1
            if not any(s is not None for s in slots):
                if source.finished():
                    break
                if not fill(list(range(b)), wait=True):
                    continue   # stream may have ended; loop re-checks
            else:
                free = [r for r in range(b) if slots[r] is None]
                if len(free) >= refill_min and not source.finished():
                    fill(free, wait=False)
            state = chunk_fn(variables, state)
            stats["chunks"] += 1
            if on_chunk is not None:
                on_chunk(stats["chunks"])
            handles = (state["done"], state["out"]) + (
                (state["trow"],) if stream_cb is not None else ())
            for a in handles:
                try:
                    a.copy_to_host_async()
                except (AttributeError, NotImplementedError):
                    pass
            inflight = (handles, list(slots))
        return stats

    while True:
        occupied = [r for r in range(b) if slots[r] is not None]
        if not occupied:
            if source.finished():
                break
            if not fill(list(range(b)), wait=True):
                continue   # stream may have ended; loop re-checks
        if lookahead:
            cur = pending if pending is not None else chunk_fn(variables,
                                                               state)
            pending = chunk_fn(variables, cur)   # computes while we harvest
            state = cur
        else:
            state = chunk_fn(variables, state)
        stats["chunks"] += 1
        if on_chunk is not None:
            on_chunk(stats["chunks"])
        if async_harvest:
            # dispatch-first + pipelined flag fetch: start this round's
            # copy, harvest LAST round's (landed during a full round of
            # device compute + host featurize — the read is ~free)
            handles = (state["done"], state["out"]) + (
                (state["trow"],) if stream_cb is not None else ())
            for a in handles:
                try:
                    a.copy_to_host_async()
                except (AttributeError, NotImplementedError):
                    pass
            ready, inflight = inflight, (handles, list(slots))
            if ready is None:
                continue   # first round: nothing landed yet
            h, snap = ready
            live = [snap[r] if (snap[r] is not None and snap[r] is slots[r])
                    else None for r in range(b)]
            if stream_cb is not None:
                done, out, trow = (np.asarray(x) for x in jax.device_get(h))
                stream_cb({"out": out, "trow": trow}, live)
            else:
                done, out = (np.asarray(x) for x in jax.device_get(h))
            finished = [r for r in range(b)
                        if live[r] is not None and done[r]]
        # one combined fetch: done + out (+ trow for streaming) in a single
        # device_get (the rows are ~KBs; on a relay-attached device the
        # roundtrip count, not the bytes, is what the loop pays for — the
        # stream callback gets the already-fetched host arrays instead of
        # re-fetching out/trow itself)
        elif stream_cb is not None:
            done, out, trow = (np.asarray(x) for x in jax.device_get(
                (state["done"], state["out"], state["trow"])))
            stream_cb({"out": out, "trow": trow}, slots)
            finished = [r for r in range(b)
                        if slots[r] is not None and done[r]]
        else:
            done, out = (np.asarray(x) for x in
                         jax.device_get((state["done"], state["out"])))
            finished = [r for r in range(b)
                        if slots[r] is not None and done[r]]
        if finished:
            for r in finished:
                idx, req, rk = slots[r]
                finish(idx, req, out[r],
                       None if rk is None else rk[0].row(rk[1]))
                slots[r] = None
                stats["served"] += 1
        free = [r for r in range(b) if slots[r] is None]
        if len(free) >= refill_min and not source.finished():
            fill(free, wait=False)
    return stats

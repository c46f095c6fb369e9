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
                        fast_argmax: Optional[bool] = None,
                        donate_state: bool = True,
                        decoding: str = "greedy",
                        temperature: float = 1.0, top_k: int = 0,
                        top_p: float = 1.0):
    """(init_fn, chunk_fn, refill_fn), all jitted.

    ``donate_state=False`` keeps the chunk program from donating its
    input state — required for ``run_continuous(lookahead=True)``, which
    reads the previous state's done/out AFTER dispatching the next chunk
    (a donated input would already be deleted). The tradeoff (in-place
    updates vs hidden host roundtrips) is a measurement question.

    init_fn(variables, batch) -> (state, rank-or-None); chunk_fn(variables,
    state) advances every live row by ``chunk_steps``; refill_fn(state,
    new_state, rows) scatters fresh rows in. Multimem models (CaSE/Masque)
    use their decode_init/decode_chunk methods; the EncDec-protocol models
    (TMemNet/GLKS/GTTP/S2SA) use the generic chunk driver in
    models/predict.py.

    ``decoding='sample'`` samples each step instead of arg-maxing
    (controls apply as in the batch sampling paths). Batches must then
    carry ``sample_key`` [B, 2] uint32 per-row PRNG key data — the key
    rides with the row and the step key is fold_in(row_key, trow), so a
    request's sampled tokens are reproducible regardless of batch
    composition, chunk size, or refill timing."""
    if decoding not in ("greedy", "sample"):
        raise ValueError(f"unknown decoding {decoding!r}")
    sampling = decoding == "sample"
    mt = type(model)
    if hasattr(mt, "decode_init"):
        init_m, chunk_m = mt.decode_init, mt.decode_chunk
    else:
        from ..models.predict import (continuous_decode_chunk,
                                      continuous_decode_init)
        init_m, chunk_m = continuous_decode_init, continuous_decode_chunk
    # sampling needs the dense extended distribution anyway — skip the
    # fast-argmax hoisted operands so they don't ride in the state
    fa = False if sampling else fast_argmax
    extra = dict(sampling=True, temperature=temperature, top_k=top_k,
                 top_p=top_p) if sampling else {}

    def init_fn(variables, batch):
        if sampling and batch.get("sample_key") is None:
            raise ValueError("decoding='sample' needs per-row 'sample_key' "
                             "key data in the batch")
        return model.apply(variables, batch, max_len=max_len,
                           fast_argmax=fa, method=init_m)

    def chunk_fn(variables, state):
        return model.apply(variables, state, n_steps=chunk_steps,
                           fast_argmax=fa, method=chunk_m, **extra)

    # the state is consumed linearly (chunk -> harvest from the NEW state
    # -> maybe refill), so donating it lets XLA update the KV caches and
    # hoisted operands in place instead of copying the whole pytree every
    # chunk (the state holds M*layers [B,T,2E] caches + memories + copy
    # operands — double-buffering it would double its HBM footprint)
    chunk_jit = jax.jit(chunk_fn, donate_argnums=(1,)) if donate_state \
        else jax.jit(chunk_fn)
    return (jax.jit(init_fn), chunk_jit,
            jax.jit(refill_rows, donate_argnums=(0,)))


class _LazyRank:
    """Defers the refill's rank fetch off the critical path: the device
    array starts an async device->host copy at construction and is
    materialized on first row access (usually chunks later, when the
    request finishes — by then the copy has landed, so the fetch is
    ~free instead of a blocking host roundtrip per refill)."""

    __slots__ = ("_arr", "_np")

    def __init__(self, arr):
        self._arr = arr
        self._np = None
        try:
            arr.copy_to_host_async()
        except (AttributeError, NotImplementedError):
            pass

    def row(self, i: int):
        if self._np is None:
            self._np = np.asarray(jax.device_get(self._arr))
            self._arr = None
        return self._np[i]


class IterSource:
    """Request source over a plain iterator. NOTE: ``take`` always blocks
    on the underlying iterator until it yields or ends (``wait`` is
    advisory here) — fine for in-memory iterators and regular files, NOT
    for a trickling pipe that stays open (in-flight rows would stall
    behind the read). Streaming inputs should go through a reader thread
    + ``QueueSource`` (cli/serve.py does this for stdin)."""

    def __init__(self, it: Iterator[dict]):
        self._it = iter(it)
        self._done = False

    def take(self, n: int, wait: bool) -> List[dict]:
        out: List[dict] = []
        while len(out) < n and not self._done:
            try:
                out.append(next(self._it))
            except StopIteration:
                self._done = True
        return out

    def finished(self) -> bool:
        return self._done


class QueueSource:
    """Request source over a ``queue.Queue`` (HTTP serving): ``wait=True``
    blocks for the first item; further items are drained without blocking,
    so the decode loop never stalls on an idle queue. A ``stop`` sentinel
    marks the stream end."""

    def __init__(self, q, stop):
        self._q = q
        self._stop = stop
        self._done = False

    def take(self, n: int, wait: bool) -> List[dict]:
        import queue as _queue

        out: List[dict] = []
        if self._done:
            return out
        if wait:
            item = self._q.get()
            if item is self._stop:
                self._done = True
                return out
            out.append(item)
        while len(out) < n:
            try:
                item = self._q.get_nowait()
            except _queue.Empty:
                break
            if item is self._stop:
                self._done = True
                break
            out.append(item)
        return out

    def finished(self) -> bool:
        return self._done


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


class Lane:
    """One continuous-decode lane: its own jitted (init, chunk, refill)
    programs and a fixed-width slot table. Multi-lane serving runs one
    lane per pool bucket (``--pool_buckets x --continuous``): requests
    with small retrieval pools decode against a compact cross-attention
    memory while still refilling mid-flight."""

    def __init__(self, key, make_batch, init_fn, chunk_fn, refill_fn,
                 batch_size: int, refill: int, refill_min: int = 1):
        self.key = key
        self.make_batch = make_batch
        self.init_fn = init_fn
        self.chunk_fn = chunk_fn
        self.refill_fn = refill_fn
        self.b = batch_size
        self.refill = max(1, min(refill, batch_size))
        self.refill_min = max(1, min(refill_min, self.refill))
        self.state = None
        self.slots: List[Optional[tuple]] = [None] * batch_size
        self.queue: List[tuple] = []   # routed (arrival_idx, req) FIFO
        self.inflight = None  # async_harvest: (flag handles, slots snapshot)

    def occupied(self) -> bool:
        return any(s is not None for s in self.slots)

    def free_rows(self) -> List[int]:
        return [r for r in range(self.b) if self.slots[r] is None]

    def fill(self, variables, stats) -> None:
        """Move queued requests into free rows (cold init or row refill).
        Mid-flight refills coalesce to ``refill_min`` free rows (see
        ``run_continuous``); a lane with no live rows always fills."""
        free = self.free_rows()
        if not free or not self.queue:
            return
        if (self.state is not None and self.occupied()
                and len(free) < self.refill_min):
            return
        width = self.b if self.state is None else self.refill
        take = self.queue[: min(len(free), width)]
        del self.queue[: len(take)]
        batch = self.make_batch([req for _, req in take], width)
        if batch is None:   # featurize failure — reporter already ran
            return
        k = len(take)
        if self.state is None:
            self.state, rank = self.init_fn(variables, batch)
        else:
            new_state, rank = self.init_fn(variables, batch)
            idx = jnp.asarray(np.asarray(
                free[:k] + [self.b] * (width - k), np.int32))
            self.state = self.refill_fn(self.state, new_state, idx)
            stats["refills"] += 1
        lazy = None if rank is None else _LazyRank(rank)
        for i, (aidx, req) in enumerate(take):
            self.slots[free[i]] = (aidx, req,
                                   None if lazy is None else (lazy, i))


def run_continuous_multi(source, lanes: List[Lane], route, variables,
                         emit: Callable[[dict, np.ndarray, np.ndarray], None],
                         ordered: bool = True,
                         on_chunk: Optional[Callable[[int], None]] = None,
                         stream_cb: Optional[Callable] = None,
                         async_harvest: bool = False
                         ) -> Dict[str, int]:
    """Drive several continuous lanes over one request source.

    ``route(req) -> Lane`` picks a lane per request (e.g. the smallest
    pool bucket that fits). Per scheduler round, every occupied lane's
    chunk is DISPATCHED before any lane's flags are fetched, so one
    lane's harvest roundtrip overlaps the other lanes' device compute.
    Emission order/semantics match ``run_continuous`` (global
    arrival-order reorder buffer when ``ordered``).

    ``async_harvest=True`` is the multi-lane analogue of the single-lane
    harvest-first pipelined order (see ``run_continuous``): each lane's
    done/out flags ride a ``copy_to_host_async`` started at dispatch and
    are read at the TOP of the next round — already landed, so zero
    blocking roundtrips between rounds instead of one per active lane.
    Because the landed copy is read BEFORE that round's fill/dispatch,
    slot turnaround matches the synchronous path (no extra chunk of
    detection lag); only ``stream_cb`` deltas arrive one round later.
    Refilled slots are protected by snapshot identity. Emitted results
    are identical. Donation-safe: a lane's landed copy is always read
    before the lane's next (donating) chunk dispatch."""
    if not hasattr(source, "take"):
        source = IterSource(source)
    next_emit = 0
    held: Dict[int, tuple] = {}

    def finish(idx: int, req: dict, ids: np.ndarray, rank):
        nonlocal next_emit
        if not ordered:
            emit(req, ids, rank)
            return
        held[idx] = (req, ids, rank)
        while next_emit in held:
            r, i, k = held.pop(next_emit)
            emit(r, i, k)
            next_emit += 1

    arrival = 0
    stats = {"served": 0, "chunks": 0, "refills": 0}

    def pump(wait: bool) -> None:
        """Route newly arrived requests onto lane queues."""
        nonlocal arrival
        room = sum(len(lane.free_rows()) + lane.b for lane in lanes)
        for req in source.take(room, wait):
            lane = route(req)
            lane.queue.append((arrival, req))
            arrival += 1

    def harvest_landed(lane: Lane) -> None:
        """Read a lane's landed flag copy (started at its last dispatch)
        and finish the rows it marks done. Snapshot identity skips slots
        refilled since the copy was taken (their stale done flag refers
        to the already-emitted previous request)."""
        if lane.inflight is None:
            return
        h, snap = lane.inflight
        lane.inflight = None
        fetched = tuple(np.asarray(x) for x in jax.device_get(h))
        done, out = fetched[0], fetched[1]
        live = [snap[r] if (snap[r] is not None
                            and snap[r] is lane.slots[r]) else None
                for r in range(lane.b)]
        if stream_cb is not None:
            stream_cb({"out": out, "trow": fetched[2]}, live)
        for r in range(lane.b):
            if live[r] is not None and done[r]:
                aidx, req, rk = lane.slots[r]
                finish(aidx, req, out[r],
                       None if rk is None else rk[0].row(rk[1]))
                lane.slots[r] = None
                stats["served"] += 1

    while True:
        if async_harvest:
            for lane in lanes:
                harvest_landed(lane)
        busy = [ln for ln in lanes if ln.occupied()]
        queued = any(ln.queue for ln in lanes)
        if not busy and not queued:
            if source.finished():
                break
            pump(wait=True)
            queued = any(ln.queue for ln in lanes)
            if not queued and source.finished():
                break
        for lane in lanes:
            lane.fill(variables, stats)
        active = [ln for ln in lanes if ln.occupied()]
        # dispatch every active lane first; the device works through them
        # while we fetch each lane's flags in turn
        for lane in active:
            lane.state = lane.chunk_fn(variables, lane.state)
            stats["chunks"] += 1
        if on_chunk is not None:
            on_chunk(stats["chunks"])
        if async_harvest:
            # start this round's flag copies; they land during the next
            # round's device compute and are read (for ~free) at its top
            for lane in active:
                handles = (lane.state["done"], lane.state["out"]) + (
                    (lane.state["trow"],) if stream_cb is not None else ())
                for a in handles:
                    try:
                        a.copy_to_host_async()
                    except (AttributeError, NotImplementedError):
                        pass
                lane.inflight = (handles, list(lane.slots))
            if not source.finished():
                pump(wait=False)
            continue
        for lane in active:
            if stream_cb is not None:
                done, out, trow = (np.asarray(x) for x in jax.device_get(
                    (lane.state["done"], lane.state["out"],
                     lane.state["trow"])))
                stream_cb({"out": out, "trow": trow}, lane.slots)
            else:
                done, out = (np.asarray(x) for x in jax.device_get(
                    (lane.state["done"], lane.state["out"])))
            hit = [r for r in range(lane.b)
                   if lane.slots[r] is not None and done[r]]
            if hit:
                for r in hit:
                    aidx, req, rk = lane.slots[r]
                    finish(aidx, req, out[r],
                           None if rk is None else rk[0].row(rk[1]))
                    lane.slots[r] = None
                    stats["served"] += 1
        if not source.finished():
            pump(wait=False)
    return stats

"""Multi-lane continuous serving: one continuous-decode lane per pool
bucket (``--pool_buckets x --continuous``). See the package docstring for
the design overview.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .base import IterSource, _LazyRank

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

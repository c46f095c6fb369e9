"""Device-resident continuous batching: K chunks per dispatch with
refills served from a pre-staged on-device ring of encoded requests.

The host-driven chunk loop (``single.run_continuous``) pays 2-3 chunks of
dead slot time per finished row: the done flags must land on the host,
the replacement request must be featurized + encoded, and the refill
scatter must be dispatched — on a relay-attached chip that lag bounded
occupancy at ~27% (docs/PERF.md round 10). Here the *device* performs
harvest and refill between chunks, inside one jitted program:

* the decode state rides in a wrapper ``{"m": model_state, "uid": [B],
  "alive": [B], "cursor": ()}`` — ``uid`` names the request occupying
  each row, ``alive`` marks rows whose request is live and unharvested;
* freshly encoded requests wait in a device-resident ring
  ``{"m": model_state[S], "uid": [S]}`` that the host replenishes with
  ``push_fn`` (a row scatter) while the device decodes;
* ``mega_fn`` runs up to ``n_chunks`` chunks of ``chunk_steps`` steps;
  between chunks it appends newly-done rows to a fixed-size harvest log
  (uid, out, trow) and refills freed rows from the ring — all with
  bounded-size ``nonzero``/scatter ops, no host involvement;
* the host replays the harvest log to emit finished requests, keyed by
  uid (ranks were captured host-side at encode time, as in the chunk
  loop).

Slot dead time drops from 2-3 host round-trip chunks to at most ONE
in-device chunk (pick ``chunk_steps`` small — the boundary logic is a
few [B]-sized scatters plus a bounded R-row gather gated behind a
``lax.cond``), and the host pays one round-trip per ``n_chunks`` chunks
instead of per chunk.

Per-request results are bit-identical to the one-shot predict for the
same reasons as the chunk loop (greedy/sampled decode math is
row-independent; tests/test_device_loop.py).

The reference has no serving path at all; the fixed-batch predict being
beaten is common/CumulativeTrainer.py:134-156.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .base import IterSource, _LazyRank, refill_rows


def _chunk_apply(model, decoding, temperature, top_k, top_p, fast_argmax):
    """Unjitted (init_m, chunk_m, fa, extra) — mirrors
    ``base.make_continuous_fns``'s method resolution so the device loop
    decodes exactly like the chunk loop."""
    if decoding not in ("greedy", "sample"):
        raise ValueError(f"unknown decoding {decoding!r}")
    sampling = decoding == "sample"
    mt = type(model)
    if hasattr(mt, "decode_init"):
        init_m, chunk_m = mt.decode_init, mt.decode_chunk
    else:
        from ...models.predict import (continuous_decode_chunk,
                                       continuous_decode_init)
        init_m, chunk_m = continuous_decode_init, continuous_decode_chunk
    fa = False if sampling else fast_argmax
    extra = dict(sampling=True, temperature=temperature, top_k=top_k,
                 top_p=top_p) if sampling else {}
    return init_m, chunk_m, fa, extra


def make_device_loop_fns(model, max_len: int, chunk_steps: int,
                         n_chunks: int, stage_rows: int,
                         refill_bound: Optional[int] = None,
                         fast_argmax: Optional[bool] = None,
                         decoding: str = "greedy",
                         temperature: float = 1.0, top_k: int = 0,
                         top_p: float = 1.0,
                         refill_cond: bool = True):
    """(init_fn, wrap_fn, stage_fn, push_fn, mega_fn), all jitted.

    * ``init_fn(variables, batch)`` -> (model_state, rank-or-None) — one
      encoded bucket (cold-start batch or a refill bucket for the ring).
    * ``wrap_fn(state, uid, alive)`` -> wrap — adds the driver rows.
    * ``stage_fn(state, uid)`` -> stage — a ``stage_rows``-row zeroed
      ring seeded with one bucket at rows [0, r).
    * ``push_fn(stage, bucket_wrap, rows)`` — scatter a freshly encoded
      bucket into ring rows (row >= stage_rows entries are dropped).
    * ``mega_fn(variables, wrap, stage, written)`` ->
      (wrap', harvest) — up to ``n_chunks`` chunks with in-device
      harvest+refill between chunks; stops early (lax.while_loop) once
      no row is alive and no staged row is available. ``written`` is the
      host's count of rows ever pushed into the ring; ``wrap["cursor"]``
      counts rows consumed. ``harvest`` = {"uid": [E], "out": [E, L],
      "trow": [E], "count": ()} with E = batch + stage_rows and
      uid == -1 on unused entries.

    ``refill_bound`` caps refills per chunk boundary (default
    ``min(batch, stage_rows)``); the R-row ring gather it implies runs
    under a ``lax.cond`` so boundaries with nothing to refill cost only
    the [B]-sized flag ops. ``refill_cond=False`` replaces the cond with
    an UNCONDITIONAL drop-mode gather+scatter (rows that cannot refill
    target row ``b`` and are dropped) — hypothesized cheaper (no cond
    branch materialization), measured ~4% SLOWER on TPU at rbound=16
    (docs/PERF.md round 14): the cond skips the gather on refill-free
    boundaries and XLA does not pay a full-state copy for the identity
    branch. Kept as the measured refutation. Overfull boundaries (more
    finishers than ``refill_bound``) carry the surplus to the next
    boundary in either mode — the free rows stay dead one more chunk.
    """
    init_m, chunk_m, fa, extra = _chunk_apply(
        model, decoding, temperature, top_k, top_p, fast_argmax)

    def init_fn(variables, batch):
        if decoding == "sample" and batch.get("sample_key") is None:
            raise ValueError("decoding='sample' needs per-row 'sample_key' "
                             "key data in the batch")
        return model.apply(variables, batch, max_len=max_len,
                           fast_argmax=fa, method=init_m)

    def wrap_fn(state, uid, alive):
        return {"m": state, "uid": jnp.asarray(uid, jnp.int32),
                "alive": jnp.asarray(alive, bool),
                "cursor": jnp.zeros((), jnp.int32)}

    def stage_fn(state, uid):
        r = uid.shape[0]
        s_m = jax.tree_util.tree_map(
            lambda x: jnp.zeros((stage_rows,) + x.shape[1:], x.dtype)
            .at[jnp.arange(r)].set(x, mode="drop"), state)
        s_uid = jnp.full((stage_rows,), -1, jnp.int32
                         ).at[jnp.arange(r)].set(uid.astype(jnp.int32),
                                                 mode="drop")
        return {"m": s_m, "uid": s_uid}

    def push_fn(stage, bucket, rows):
        return refill_rows(stage, bucket, rows)

    def mega_fn(variables, wrap, stage, written):
        b = wrap["uid"].shape[0]
        e = b + stage_rows
        rbound = refill_bound or min(b, stage_rows)
        written = jnp.asarray(written, jnp.int32)
        harvest = {
            "uid": jnp.full((e,), -1, jnp.int32),
            "out": jnp.zeros((e, max_len), jnp.int32),
            "trow": jnp.zeros((e,), jnp.int32),
            "count": jnp.zeros((), jnp.int32),
        }

        def boundary(m, uid, alive, cursor, harvest):
            done = m["done"]
            newly = done & alive
            # ---- harvest: append newly-done rows to the log ----
            slots = jnp.nonzero(newly, size=b, fill_value=b)[0]
            valid = slots < b
            sl = jnp.clip(slots, 0, b - 1)
            hpos = jnp.where(valid, harvest["count"] + jnp.arange(b), e)
            harvest = dict(
                harvest,
                uid=harvest["uid"].at[hpos].set(uid[sl], mode="drop"),
                out=harvest["out"].at[hpos].set(m["out"][sl], mode="drop"),
                trow=harvest["trow"].at[hpos].set(m["trow"][sl],
                                                  mode="drop"),
                count=harvest["count"] + newly.sum(dtype=jnp.int32))
            alive = alive & ~newly
            # ---- refill: first R free slots take the next staged rows --
            free = ~alive
            fslots = jnp.nonzero(free, size=rbound, fill_value=b)[0]
            take = cursor + jnp.arange(rbound, dtype=jnp.int32)
            can = (fslots < b) & (take < written)

            src = jnp.clip(take, 0, None) % stage_rows
            tgt = jnp.where(can, fslots, b)

            def do_refill(args):
                m, uid, alive, cursor = args
                g = jax.tree_util.tree_map(lambda s: s[src], stage["m"])
                m = jax.tree_util.tree_map(
                    lambda live, gg: live.at[tgt].set(gg, mode="drop"),
                    m, g)
                uid = uid.at[tgt].set(stage["uid"][src], mode="drop")
                alive = alive.at[tgt].set(True, mode="drop")
                return m, uid, alive, cursor + can.sum(dtype=jnp.int32)

            if refill_cond:
                # default: skip the gather when nothing can refill. The
                # cond.103 "934 MB touched" in the round-13 mega xprof is
                # accounting of the operands, not a materialized identity
                # copy — the round-14 A/B shows removing the cond LOSES
                # ~4% (1079 vs 1036 qps same-session, docs/PERF.md).
                m, uid, alive, cursor = jax.lax.cond(
                    can.any(), do_refill, lambda a: a,
                    (m, uid, alive, cursor))
            else:
                # refuted alternative (kept measurable): unconditional
                # bounded refill — rows with can=False scatter to row b
                # and are dropped, so every boundary pays exactly one
                # rbound-row ring gather + in-place scatter and no cond.
                # Garbage ring rows gathered when the ring is short are
                # never written (their tgt is b). Numerics identical to
                # the cond path (tests/test_device_loop.py runs both).
                m, uid, alive, cursor = do_refill((m, uid, alive, cursor))
            return m, uid, alive, cursor, harvest

        def cond(carry):
            i, m, uid, alive, cursor, harvest = carry
            return (i < n_chunks) & (alive.any() | (cursor < written))

        def body(carry):
            i, m, uid, alive, cursor, harvest = carry
            m, uid, alive, cursor, harvest = boundary(m, uid, alive,
                                                      cursor, harvest)
            m = model.apply(variables, m, n_steps=chunk_steps,
                            fast_argmax=fa, method=chunk_m, **extra)
            return i + 1, m, uid, alive, cursor, harvest

        carry = (jnp.zeros((), jnp.int32), wrap["m"], wrap["uid"],
                 wrap["alive"], wrap["cursor"], harvest)
        carry = jax.lax.while_loop(cond, body, carry)
        i, m, uid, alive, cursor, harvest = carry
        # trailing boundary: harvest the last chunk's finishers (and
        # pre-refill freed rows so the next mega's first chunk starts
        # full)
        m, uid, alive, cursor, harvest = boundary(m, uid, alive, cursor,
                                                  harvest)
        harvest["chunks"] = i   # chunks actually run (early exit when
        # nothing is alive and the ring is dry) — occupancy accounting
        # cursor rides in the harvest too: the wrap's copy is donated to
        # the NEXT mega before a lookahead driver reads this one's
        # results (jit materializes duplicated outputs as distinct
        # buffers — the _LazyRank safety contract, tests/
        # test_continuous.py::test_lazy_rank_survives_donating_chunk)
        harvest["cursor"] = cursor
        # live-row snapshot for token streaming: still-decoding rows'
        # emitted prefixes at mega end. Same duplicated-output contract
        # as cursor above; only fetched when a stream_cb is installed
        # (run_continuous_device), so non-streaming drivers pay nothing
        # but the device-side copies (~KBs).
        harvest["live_uid"] = uid
        harvest["live_alive"] = alive
        harvest["live_out"] = m["out"]
        harvest["live_trow"] = m["trow"]
        return ({"m": m, "uid": uid, "alive": alive, "cursor": cursor},
                harvest)

    return DeviceLoopFns(
        init_fn=jax.jit(init_fn), wrap_fn=jax.jit(wrap_fn),
        stage_fn=jax.jit(stage_fn),
        push_fn=jax.jit(push_fn, donate_argnums=(0,)),
        mega_fn=jax.jit(mega_fn, donate_argnums=(1,)),
        stage_rows=stage_rows, n_chunks=n_chunks, chunk_steps=chunk_steps)


class DeviceLoopFns:
    """Jitted programs + static config for the device-resident loop."""

    def __init__(self, init_fn, wrap_fn, stage_fn, push_fn, mega_fn,
                 stage_rows, n_chunks, chunk_steps):
        self.init_fn = init_fn
        self.wrap_fn = wrap_fn
        self.stage_fn = stage_fn
        self.push_fn = push_fn
        self.mega_fn = mega_fn
        self.stage_rows = stage_rows
        self.n_chunks = n_chunks
        self.chunk_steps = chunk_steps


def run_continuous_device(source,
                          make_batch: Callable[[List[dict], int],
                                               Dict[str, np.ndarray]],
                          fns, variables, batch_size: int, refill: int,
                          emit: Callable[[dict, np.ndarray, np.ndarray],
                                         None],
                          max_len: int, ordered: bool = True,
                          on_mega: Optional[Callable[[int], None]] = None,
                          lookahead: bool = False,
                          stream_cb: Optional[Callable] = None
                          ) -> Dict[str, int]:
    """Drive the device-resident loop over a request source.

    Semantics match ``single.run_continuous``: ``make_batch`` featurizes
    up to ``width`` requests into a fixed-width batch, ``emit(req,
    ids_row, rank_row)`` receives finished requests (arrival order when
    ``ordered``). Per round the host (1) tops up the device ring with
    freshly encoded ``refill``-row buckets while the previous mega runs,
    (2) dispatches the next mega, (3) fetches + replays the harvest log.
    Returns counters; "chunks" counts device chunk capacity
    (megas * n_chunks upper bound is not assumed — occupancy accounting
    uses served trows, see tools/exp_continuous.py --device_loop).

    ``stream_cb(host, slots)`` (same contract as the chunk loops'):
    called once per harvested mega with the live rows' decoded prefixes
    — ``host`` = numpy {"out": [B, L], "trow": [B]}, ``slots``[r] =
    the row's (arrival_idx, req, rank_ref) or None. Delta granularity
    is one mega (the device runs n_chunks chunks per host roundtrip —
    the host cannot observe anything finer); with ``lookahead`` deltas
    lag one additional mega, exactly like harvest detection."""
    b = batch_size
    s = fns.stage_rows
    # the refill bucket's width is bounded by the RING (not the live
    # batch; the ring scatter takes any width <= stage_rows). Width is a
    # measured knee: round-11 read 64-wide as best, but the round-14
    # interleaved same-session A/B reversed that — 16-wide refill
    # encodes run +12% over 64-wide at B=64 (1076 vs 957 qps, caps 4-40;
    # docs/PERF.md round 14) — so the serve CLI's B/4 default stands
    refill = max(1, min(refill, s))
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

    stats = {"served": 0, "megas": 0, "refills": 0, "steps_served": 0,
             "chunks": 0}
    byuid: Dict[int, tuple] = {}   # uid -> (arrival_idx, req, rank_ref)
    next_uid = 0
    written = 0        # rows ever pushed into the ring (host view)
    consumed = 0       # wrap["cursor"] at last harvest (host view)
    stage = None
    wrap = None
    pending = None     # lookahead: one dispatched mega's harvest handles

    def encode(reqs, width):
        """Featurize + encode one bucket; returns (state, uids) or None.
        Rank handles are captured here, keyed by uid (exactly like the
        chunk loop's _LazyRank-per-bucket)."""
        nonlocal next_uid
        batch = make_batch(reqs, width)
        if batch is None:
            return None
        state, rank = fns.init_fn(variables, batch)
        lazy = None if rank is None else _LazyRank(rank)
        uids = np.full((width,), -1, np.int64)
        for i, req in enumerate(reqs):
            uids[i] = next_uid
            byuid[next_uid] = (next_uid, req,
                               None if lazy is None else (lazy, i))
            next_uid += 1
        return state, uids

    while True:
        if wrap is None:
            # cold start: one full-width bucket becomes the live state
            if source.finished() and not byuid:
                break
            reqs = source.take(b, wait=True)
            if not reqs:
                continue
            enc = encode(reqs, b)
            if enc is None:
                continue
            state, uids = enc
            wrap = fns.wrap_fn(state, uids, uids >= 0)
        # top up the ring (these encode dispatches queue behind the
        # previous mega on the device, so they overlap decode compute).
        # When nothing is in flight and the ring is drained, block for
        # the next request instead of spinning empty megas.
        while (written - consumed) + refill <= s and not source.finished():
            idle = not byuid and written == consumed
            reqs = source.take(refill, wait=idle)
            if not reqs:
                break
            enc = encode(reqs, refill)
            if enc is None:
                continue
            state, uids = enc
            k = int((uids >= 0).sum())
            if stage is None and written == 0 and k == refill:
                stage = fns.stage_fn(state, jnp.asarray(uids, jnp.int32))
            else:
                if stage is None:
                    stage = _empty_stage(fns, wrap)
                rows = np.asarray(
                    [(written + i) % s if uids[i] >= 0 else s
                     for i in range(len(uids))], np.int32)
                stage = fns.push_fn(stage,
                                    {"m": state,
                                     "uid": jnp.asarray(uids, jnp.int32)},
                                    jnp.asarray(rows))
            written += k
            stats["refills"] += 1
        if stage is None:
            stage = _empty_stage(fns, wrap)
        wrap, harvest = fns.mega_fn(variables, wrap, stage,
                                    np.int32(written))
        stats["megas"] += 1
        if on_mega is not None:
            on_mega(stats["megas"])
        if lookahead:
            # double-dispatch: start the harvest's device->host copy,
            # process the PREVIOUS mega's results while this one
            # computes. Detection of a finished request lags one mega;
            # the per-mega roundtrip disappears behind device work.
            for a in jax.tree_util.tree_leaves(harvest):
                try:
                    a.copy_to_host_async()
                except (AttributeError, NotImplementedError):
                    pass
            harvest, pending = pending, harvest
            if harvest is None:
                continue
        fetch = (harvest["uid"], harvest["out"], harvest["trow"],
                 harvest["count"], harvest["chunks"], harvest["cursor"])
        if stream_cb is not None:
            fetch += (harvest["live_uid"], harvest["live_alive"],
                      harvest["live_out"], harvest["live_trow"])
        fetched = [np.asarray(x) for x in jax.device_get(fetch)]
        h_uid, h_out, h_trow, h_count, h_chunks, consumed = fetched[:6]
        consumed = int(consumed)
        stats["chunks"] += int(h_chunks)
        if stream_cb is not None:
            l_uid, l_alive, l_out, l_trow = fetched[6:]
            slots = [byuid.get(int(l_uid[r])) if l_alive[r] else None
                     for r in range(l_uid.shape[0])]
            stream_cb({"out": l_out, "trow": l_trow}, slots)
        for i in range(int(h_count)):
            uid = int(h_uid[i])
            arrival, req, rk = byuid.pop(uid)
            finish(arrival, req, h_out[i],
                   None if rk is None else rk[0].row(rk[1]))
            stats["served"] += 1
            stats["steps_served"] += int(h_trow[i]) + 1
        if source.finished() and not byuid and written == consumed:
            break
    return stats


def _empty_stage(fns, wrap):
    """A zero-availability ring built from the live state's row shapes
    (used before any refill bucket exists; ``written`` stays 0 so the
    device never consumes its garbage rows)."""
    b = wrap["uid"].shape[0]
    return fns.stage_fn(wrap["m"], jnp.full((b,), -1, jnp.int32))


class DeviceLane:
    """One device-resident decode lane — its own live state + staging
    ring — for one static pool bucket (``--device_loop x
    --pool_buckets``). The jitted ``fns`` are shared across lanes: jit
    caches one executable per state shape, i.e. per bucket (same
    contract as the chunk-loop ``Lane``)."""

    def __init__(self, key, make_batch, fns, batch_size: int, refill: int):
        self.key = key
        self.make_batch = make_batch
        self.fns = fns
        self.b = batch_size
        self.s = fns.stage_rows
        self.refill = max(1, min(refill, self.s))   # ring-bounded, like
        # run_continuous_device (a wider-than-B encode bucket is legal)
        self.queue: List[tuple] = []   # routed (arrival_idx, req) FIFO
        self.wrap = None
        self.stage = None
        self.written = 0       # ring rows ever pushed (host view)
        self.consumed = 0      # wrap cursor at last processed harvest
        self.inflight = 0      # uids encoded, not yet harvested
        self.pending = None    # lookahead: dispatched-unread harvest


def run_continuous_device_multi(source, lanes: List[DeviceLane], route,
                                variables,
                                emit: Callable[[dict, np.ndarray,
                                                np.ndarray], None],
                                max_len: int, ordered: bool = True,
                                on_mega: Optional[Callable[[int],
                                                           None]] = None,
                                lookahead: bool = False,
                                stream_cb: Optional[Callable] = None
                                ) -> Dict[str, int]:
    """Drive one device-resident loop per pool bucket over one source.

    The multi-lane analogue of ``run_continuous_device``, with the
    scheduler shape of ``multi.run_continuous_multi``: per round every
    active lane's mega is DISPATCHED before any lane's harvest is
    fetched, so one lane's roundtrip overlaps the other lanes' device
    compute. ``route(req) -> DeviceLane`` picks a lane per request
    (smallest pool bucket that fits). Emission is global arrival order
    when ``ordered``; per-request results are bit-identical to the
    single-lane device loop at the same bucket (row-independent decode
    math — tests/test_continuous_matrix.py's device_loop axis).

    ``lookahead`` double-dispatches per lane (detection lag: one extra
    mega, roundtrip hidden behind device work); ``stream_cb`` receives
    per-mega live-row prefixes per lane (contract as
    ``run_continuous_device``)."""
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

    stats = {"served": 0, "megas": 0, "refills": 0, "steps_served": 0,
             "chunks": 0}
    byuid: Dict[int, tuple] = {}   # uid -> (arrival_idx, req, rank_ref)
    next_uid = 0
    arrival = 0

    def pump(wait: bool) -> None:
        """Route arrivals onto lane queues, bounded by each lane's live
        rows + ring capacity still unqueued (backpressure on the source)."""
        nonlocal arrival
        room = sum(max(0, lane.b + lane.s - len(lane.queue))
                   for lane in lanes)
        for req in source.take(max(room, 1) if wait else room, wait):
            lane = route(req)
            lane.queue.append((arrival, req))
            arrival += 1

    def encode(lane: DeviceLane, entries, width):
        """Featurize + encode one bucket for ``lane``; assigns uids and
        captures rank handles exactly like the single-lane driver."""
        nonlocal next_uid
        batch = lane.make_batch([req for _, req in entries], width)
        if batch is None:   # featurize failure — reporter already ran
            return None
        state, rank = lane.fns.init_fn(variables, batch)
        lazy = None if rank is None else _LazyRank(rank)
        uids = np.full((width,), -1, np.int64)
        for i, (aidx, req) in enumerate(entries):
            uids[i] = next_uid
            byuid[next_uid] = (aidx, req,
                              None if lazy is None else (lazy, i))
            next_uid += 1
            lane.inflight += 1
        return state, uids

    def topup(lane: DeviceLane) -> None:
        if lane.wrap is None and lane.queue:
            take = lane.queue[: lane.b]
            del lane.queue[: len(take)]
            enc = encode(lane, take, lane.b)
            if enc is None:
                return
            state, uids = enc
            lane.wrap = lane.fns.wrap_fn(state, uids, uids >= 0)
        while (lane.wrap is not None and lane.queue
               and (lane.written - lane.consumed) + lane.refill <= lane.s):
            take = lane.queue[: lane.refill]
            del lane.queue[: len(take)]
            enc = encode(lane, take, lane.refill)
            if enc is None:
                continue
            state, uids = enc
            if lane.stage is None:
                lane.stage = _empty_stage(lane.fns, lane.wrap)
            rows = np.asarray(
                [(lane.written + i) % lane.s if uids[i] >= 0 else lane.s
                 for i in range(len(uids))], np.int32)
            lane.stage = lane.fns.push_fn(
                lane.stage, {"m": state, "uid": jnp.asarray(uids,
                                                            jnp.int32)},
                jnp.asarray(rows))
            lane.written += int((uids >= 0).sum())
            stats["refills"] += 1

    def process(lane: DeviceLane, harvest) -> None:
        fetch = (harvest["uid"], harvest["out"], harvest["trow"],
                 harvest["count"], harvest["chunks"], harvest["cursor"])
        if stream_cb is not None:
            fetch += (harvest["live_uid"], harvest["live_alive"],
                      harvest["live_out"], harvest["live_trow"])
        fetched = [np.asarray(x) for x in jax.device_get(fetch)]
        h_uid, h_out, h_trow, h_count, h_chunks, cur = fetched[:6]
        lane.consumed = int(cur)
        stats["chunks"] += int(h_chunks)
        if stream_cb is not None:
            l_uid, l_alive, l_out, l_trow = fetched[6:]
            slots = [byuid.get(int(l_uid[r])) if l_alive[r] else None
                     for r in range(l_uid.shape[0])]
            stream_cb({"out": l_out, "trow": l_trow}, slots)
        for i in range(int(h_count)):
            uid = int(h_uid[i])
            aidx, req, rk = byuid.pop(uid)
            finish(aidx, req, h_out[i],
                   None if rk is None else rk[0].row(rk[1]))
            lane.inflight -= 1
            stats["served"] += 1
            stats["steps_served"] += int(h_trow[i]) + 1

    while True:
        pump(wait=False)
        if not any(ln.inflight > 0 or ln.queue for ln in lanes):
            if source.finished():
                break
            pump(wait=True)
            if (not any(ln.queue for ln in lanes)) and source.finished():
                break
        for lane in lanes:
            topup(lane)
        dispatched = []
        for lane in lanes:
            if lane.wrap is None or lane.inflight <= 0:
                continue
            if lane.stage is None:
                lane.stage = _empty_stage(lane.fns, lane.wrap)
            lane.wrap, harvest = lane.fns.mega_fn(
                variables, lane.wrap, lane.stage, np.int32(lane.written))
            stats["megas"] += 1
            dispatched.append((lane, harvest))
        if on_mega is not None and dispatched:
            on_mega(stats["megas"])
        for lane, harvest in dispatched:
            if lookahead:
                for a in jax.tree_util.tree_leaves(harvest):
                    try:
                        a.copy_to_host_async()
                    except (AttributeError, NotImplementedError):
                        pass
                harvest, lane.pending = lane.pending, harvest
                if harvest is None:
                    continue
            process(lane, harvest)
    return stats

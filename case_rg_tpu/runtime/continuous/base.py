"""Shared continuous-batching infrastructure: the jitted program
builders (init/chunk/refill), request sources, and the lazy rank handle.
See the package docstring (``runtime/continuous/__init__.py``) for the
design overview.
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
        from ...models.predict import (continuous_decode_chunk,
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

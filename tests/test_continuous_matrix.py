"""Continuous-serving mode matrix (VERDICT r2 item 7).

``runtime/continuous`` exposes a combinatorial surface — {lookahead,
async_harvest, decoding=sample, streaming, refill_min, donation} on the
single-lane driver plus the multi-lane (pool-bucket) driver — and the
per-pair tests in test_continuous.py don't pin the cross-product. This
sweep runs EVERY combination end-to-end over one tiny CaSE model and
asserts, per request:

* greedy combos — answers byte-identical (up to EOS trim) and rankings
  bit-identical to the one-shot batch ``predict``;
* sample combos — answers byte-identical to the FIRST sampled combo
  (per-row keys make sampling composition-invariant, so every loop
  variant must emit the same tokens);
* streaming combos — every ``stream_cb`` delta is a prefix of the row's
  final emitted answer (no token is ever retracted or reordered);
* all combos — global arrival-order emission and full service.

Compile cost stays tiny: the jitted fn triples are cached per
(decoding, donate) — 4 programs for the whole matrix.
"""

import itertools

import numpy as np
import pytest

import jax.numpy as jnp

from tests.test_continuous import _models_with_live_eos, _row_keys, _trim

MAX_LEN = 12
_CACHE = {}


def _setup():
    if "setup" not in _CACHE:
        _CACHE["setup"] = _models_with_live_eos("case", MAX_LEN)
    return _CACHE["setup"]


def _fns(model, decoding, donate):
    from case_rg_tpu.runtime.continuous import make_continuous_fns
    key = (decoding, donate)
    if key not in _CACHE:
        _CACHE[key] = make_continuous_fns(model, MAX_LEN, chunk_steps=3,
                                          donate_state=donate,
                                          decoding=decoding)
    return _CACHE[key]


MATRIX = [
    pytest.param(la, ah, dec, stream, rmin,
                 id=f"la{la:d}-ah{ah:d}-{dec}-st{stream:d}-rm{rmin}")
    for la, ah, dec, stream, rmin in itertools.product(
        (False, True), (False, True), ("greedy", "sample"),
        (False, True), (1, 2))
]


@pytest.mark.parametrize("lookahead,async_harvest,decoding,stream,refill_min",
                         MATRIX)
def test_single_lane_matrix(lookahead, async_harvest, decoding, stream,
                            refill_min):
    from case_rg_tpu.runtime.continuous import run_continuous

    model, params, arrays, base_ids, base_rank, eos = _setup()
    n = arrays["query"].shape[0]
    keys = _row_keys(n, seed=9)
    requests = [{"i": i} for i in range(n)]

    def make_batch(chunkreqs, bs):
        idx = [r["i"] for r in chunkreqs]
        idx = idx + [idx[-1]] * (bs - len(idx))
        b = {k: jnp.asarray(v[idx]) for k, v in arrays.items()}
        if decoding == "sample":
            b["sample_key"] = jnp.asarray(keys[idx])
        return b

    # lookahead reads the previous state's flags after dispatching the
    # next chunk, so it needs the non-donating programs (documented on
    # make_continuous_fns); every other combo runs donating.
    fns = _fns(model, decoding, donate=not lookahead)

    seen_prefixes = {}   # request i -> longest streamed token prefix

    def stream_cb(host, slots):
        out, trow = host["out"], host["trow"]
        for r, slot in enumerate(slots):
            if slot is None:
                continue
            i = slot[1]["i"]
            t = int(trow[r])
            prefix = out[r][:t].copy()
            prev = seen_prefixes.get(i)
            if prev is not None and len(prev) <= len(prefix):
                np.testing.assert_array_equal(
                    prefix[: len(prev)], prev,
                    err_msg=f"stream retracted tokens for request {i}")
            if prev is None or len(prefix) > len(prev):
                seen_prefixes[i] = prefix

    got = []
    stats = run_continuous(
        iter(requests), make_batch, *fns, {"params": params},
        batch_size=4, refill=2,
        emit=lambda r, ids, rk: got.append((r["i"], ids.copy(), rk.copy())),
        max_len=MAX_LEN, lookahead=lookahead, async_harvest=async_harvest,
        refill_min=refill_min, stream_cb=stream_cb if stream else None)

    assert stats["served"] == n
    assert [g[0] for g in got] == list(range(n)), "arrival order violated"

    if decoding == "greedy":
        for i, ids, rk in got:
            np.testing.assert_array_equal(
                _trim(ids, eos), _trim(base_ids[i], eos),
                err_msg=f"request {i}")
            np.testing.assert_allclose(rk, base_rank[i], rtol=1e-6,
                                       atol=1e-7)
    else:
        # composition invariance: every sampled combo must emit exactly
        # what the first sampled combo emitted (same per-row keys)
        ref = _CACHE.setdefault("sample_ref",
                                {i: ids for i, ids, _ in got})
        for i, ids, rk in got:
            np.testing.assert_array_equal(ids, ref[i],
                                          err_msg=f"sampled request {i}")
    if stream:
        for i, ids, _ in got:
            pref = seen_prefixes.get(i)
            if pref is not None and len(pref):
                np.testing.assert_array_equal(
                    ids[: len(pref)], pref,
                    err_msg=f"final answer contradicts stream, request {i}")


def _dfns(model, decoding):
    from case_rg_tpu.runtime.continuous import make_device_loop_fns
    key = ("device", decoding)
    if key not in _CACHE:
        _CACHE[key] = make_device_loop_fns(model, MAX_LEN, chunk_steps=3,
                                           n_chunks=2, stage_rows=4,
                                           decoding=decoding)
    return _CACHE[key]


@pytest.mark.parametrize("lookahead,decoding,stream", [
    pytest.param(la, dec, st, id=f"la{la:d}-{dec}-st{st:d}")
    for la, dec, st in itertools.product((False, True),
                                         ("greedy", "sample"),
                                         (False, True))
])
def test_device_loop_matrix(lookahead, decoding, stream):
    """The device-resident loop across the same axes: answers equal the
    one-shot predict (greedy) / the first sampled combo (sample), global
    arrival order, and streamed live-row prefixes are never retracted
    (deltas arrive once per mega — the in-jit loop's granularity)."""
    from case_rg_tpu.runtime.continuous import run_continuous_device

    model, params, arrays, base_ids, base_rank, eos = _setup()
    n = arrays["query"].shape[0]
    keys = _row_keys(n, seed=9)
    requests = [{"i": i} for i in range(n)]

    def make_batch(chunkreqs, bs):
        idx = [r["i"] for r in chunkreqs]
        idx = idx + [idx[-1]] * (bs - len(idx))
        b = {k: jnp.asarray(v[idx]) for k, v in arrays.items()}
        if decoding == "sample":
            b["sample_key"] = jnp.asarray(keys[idx])
        return b

    seen_prefixes = {}

    def stream_cb(host, slots):
        out, trow = host["out"], host["trow"]
        for r, slot in enumerate(slots):
            if slot is None:
                continue
            i = slot[1]["i"]
            t = int(trow[r])
            prefix = out[r][:t].copy()
            prev = seen_prefixes.get(i)
            if prev is not None and len(prev) <= len(prefix):
                np.testing.assert_array_equal(
                    prefix[: len(prev)], prev,
                    err_msg=f"stream retracted tokens for request {i}")
            if prev is None or len(prefix) > len(prev):
                seen_prefixes[i] = prefix

    got = []
    stats = run_continuous_device(
        iter(requests), make_batch, _dfns(model, decoding),
        {"params": params}, batch_size=4, refill=2,
        emit=lambda r, ids, rk: got.append((r["i"], ids.copy(), rk.copy())),
        max_len=MAX_LEN, lookahead=lookahead,
        stream_cb=stream_cb if stream else None)

    assert stats["served"] == n
    assert [g[0] for g in got] == list(range(n)), "arrival order violated"
    if decoding == "greedy":
        for i, ids, rk in got:
            np.testing.assert_array_equal(
                _trim(ids, eos), _trim(base_ids[i], eos),
                err_msg=f"request {i}")
            np.testing.assert_allclose(rk, base_rank[i], rtol=1e-6,
                                       atol=1e-7)
    else:
        ref = _CACHE.setdefault("sample_ref",
                                {i: ids for i, ids, _ in got})
        for i, ids, rk in got:
            np.testing.assert_array_equal(ids, ref[i],
                                          err_msg=f"sampled request {i}")
    if stream:
        for i, ids, _ in got:
            pref = seen_prefixes.get(i)
            if pref is not None and len(pref):
                np.testing.assert_array_equal(
                    ids[: len(pref)], pref,
                    err_msg=f"final answer contradicts stream, request {i}")


@pytest.mark.parametrize("lookahead,decoding,stream", [
    (False, "greedy", False), (True, "greedy", True),
    (False, "sample", True), (True, "sample", False),
])
def test_device_loop_multi_lane(lookahead, decoding, stream):
    """Device loop x pool buckets: one device ring per static pool size
    (VERDICT r3 item 2). Greedy answers equal each request's one-shot
    predict at ITS pool size; sampled answers equal the single-lane
    sampled reference where the pool matches (lane k=3 rows)."""
    import jax

    from case_rg_tpu.runtime.continuous import (DeviceLane,
                                                run_continuous_device_multi)

    model, params, arrays, base3, rank3, eos = _setup()
    arrays2 = {"query": arrays["query"], "passage": arrays["passage"][:, :2]}
    out2 = jax.device_get(jax.jit(lambda p, bt: model.apply(
        {"params": p}, bt, max_len=MAX_LEN, method=type(model).predict))(
        params, {k: jnp.asarray(v) for k, v in arrays2.items()}))
    base2, rank2 = np.asarray(out2["answer"]), np.asarray(out2["rank"])

    n = arrays["query"].shape[0]
    keys = _row_keys(n, seed=9)
    requests = [{"i": i, "k": 3 if i % 2 == 0 else 2} for i in range(n)]
    fns = _dfns(model, decoding)

    def mb_for(k):
        src = arrays if k == 3 else arrays2

        def mb(chunkreqs, bs):
            idx = [r["i"] for r in chunkreqs]
            idx = idx + [idx[-1]] * (bs - len(idx))
            b = {kk: jnp.asarray(v[idx]) for kk, v in src.items()}
            if decoding == "sample":
                b["sample_key"] = jnp.asarray(keys[idx])
            return b
        return mb

    lanes = {k: DeviceLane(k, mb_for(k), fns, batch_size=2, refill=1)
             for k in (2, 3)}
    got = []
    run_continuous_device_multi(
        iter(requests), list(lanes.values()), lambda r: lanes[r["k"]],
        {"params": params},
        emit=lambda r, ids, rk: got.append((r["i"], r["k"], ids.copy(),
                                            rk.copy())),
        max_len=MAX_LEN, lookahead=lookahead,
        stream_cb=(lambda host, slots: None) if stream else None)
    assert [g[0] for g in got] == list(range(n)), "arrival order violated"
    assert len(got) == n
    for i, k, ids, rk in got:
        if decoding == "greedy":
            base, rank = (base3, rank3) if k == 3 else (base2, rank2)
            np.testing.assert_array_equal(_trim(ids, eos),
                                          _trim(base[i], eos),
                                          err_msg=f"request {i} lane {k}")
            np.testing.assert_allclose(rk, rank[i], rtol=1e-6, atol=1e-7)
        elif k == 3 and "sample_ref" in _CACHE:
            np.testing.assert_array_equal(
                ids, _CACHE["sample_ref"][i],
                err_msg=f"sampled request {i} diverged from the "
                        f"single-lane sampled reference")


@pytest.mark.parametrize("async_harvest,decoding,stream", [
    (False, "greedy", False), (True, "greedy", True),
    (False, "sample", True), (True, "sample", False),
])
def test_multi_lane_matrix(async_harvest, decoding, stream):
    """The pool-bucket (multi-lane) driver across the same axes: two lanes
    at different pool sizes; greedy answers equal each request's one-shot
    predict at ITS pool size, sampled answers equal the single-lane
    sampled reference where the pool matches (lane k=3 rows)."""
    import jax

    from case_rg_tpu.runtime.continuous import Lane, run_continuous_multi

    model, params, arrays, base3, rank3, eos = _setup()
    arrays2 = {"query": arrays["query"], "passage": arrays["passage"][:, :2]}
    out2 = jax.device_get(jax.jit(lambda p, bt: model.apply(
        {"params": p}, bt, max_len=MAX_LEN, method=type(model).predict))(
        params, {k: jnp.asarray(v) for k, v in arrays2.items()}))
    base2, rank2 = np.asarray(out2["answer"]), np.asarray(out2["rank"])

    n = arrays["query"].shape[0]
    keys = _row_keys(n, seed=9)
    requests = [{"i": i, "k": 3 if i % 2 == 0 else 2} for i in range(n)]
    fns = _fns(model, decoding, donate=True)

    def mb_for(k):
        src = arrays if k == 3 else arrays2

        def mb(chunkreqs, bs):
            idx = [r["i"] for r in chunkreqs]
            idx = idx + [idx[-1]] * (bs - len(idx))
            b = {kk: jnp.asarray(v[idx]) for kk, v in src.items()}
            if decoding == "sample":
                b["sample_key"] = jnp.asarray(keys[idx])
            return b
        return mb

    lanes = {k: Lane(k, mb_for(k), *fns, batch_size=2, refill=1)
             for k in (2, 3)}
    got = []
    run_continuous_multi(
        iter(requests), list(lanes.values()), lambda r: lanes[r["k"]],
        {"params": params},
        emit=lambda r, ids, rk: got.append((r["i"], r["k"], ids.copy(),
                                            rk.copy())),
        stream_cb=(lambda host, slots: None) if stream else None,
        async_harvest=async_harvest)
    assert [g[0] for g in got] == list(range(n)), "arrival order violated"
    for i, k, ids, rk in got:
        if decoding == "greedy":
            base, rank = (base3, rank3) if k == 3 else (base2, rank2)
            np.testing.assert_array_equal(_trim(ids, eos),
                                          _trim(base[i], eos),
                                          err_msg=f"request {i} lane {k}")
            np.testing.assert_allclose(rk, rank[i], rtol=1e-6, atol=1e-7)
        elif k == 3 and "sample_ref" in _CACHE:
            np.testing.assert_array_equal(
                ids, _CACHE["sample_ref"][i],
                err_msg=f"sampled request {i} diverged from the "
                        f"single-lane sampled reference")

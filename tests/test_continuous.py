"""Continuous batching: chunked per-row decode must reproduce the one-shot
scan decode bit-for-bit per request, regardless of batch composition or
refill staggering (rows are independent in greedy decode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from case_rg_tpu.config import ModelConfig
from case_rg_tpu.models import create_model

V = 512


def _arrays(rng, n):
    return {
        "query": rng.randint(4, V, size=(n, 1, 10)).astype(np.int32),
        "passage": rng.randint(4, V, size=(n, 3, 12)).astype(np.int32),
    }


def _init_params(model, arrays):
    b = arrays["query"].shape[0]
    init_batch = {
        "query": jnp.asarray(arrays["query"]),
        "passage": jnp.asarray(arrays["passage"]),
        "response": jnp.asarray(np.full((b, 8), 5, np.int32)),
        "passage_label": jnp.zeros((b,), jnp.int32),
        "token_label": jnp.zeros(arrays["passage"].shape, jnp.float32),
        "token_weight": jnp.ones(arrays["passage"].shape, jnp.float32),
        "sample_weight": jnp.ones((b,), jnp.float32),
    }
    return model.init({"params": jax.random.PRNGKey(0),
                       "dropout": jax.random.PRNGKey(1)},
                      init_batch, method=type(model).train_losses)["params"]


def _models_with_live_eos(name="case", max_len=12, b=8, seed=7):
    """(model, params, arrays, base_ids): a tiny model whose eos_id is a
    token the greedy decode actually emits (the most frequent decoded id),
    so rows finish at staggered steps. The scan decode ignores EOS
    entirely (ref CaSE/Model.py:119-123), so re-tagging a token as EOS
    does not change the emitted ids."""
    cfg = ModelConfig(name=name, vocab_size=V, embedding_size=16,
                      hidden_size=16, num_heads=2, enc_layers=1, dec_layers=1,
                      max_dec_len=max_len)
    model = create_model(name, cfg)
    rng = np.random.RandomState(seed)
    arrays = _arrays(rng, b)
    params = _init_params(model, arrays)
    batch = {k: jnp.asarray(v) for k, v in arrays.items()}
    base = jax.device_get(jax.jit(lambda p, bt: model.apply(
        {"params": p}, bt, max_len=max_len,
        method=type(model).predict))(params, batch))
    ids = np.asarray(base["answer"])
    # most frequent emitted token (excluding PAD) becomes "EOS"
    vals, counts = np.unique(ids[ids != 0], return_counts=True)
    eos = int(vals[np.argmax(counts)])
    import dataclasses
    cfg2 = dataclasses.replace(cfg, eos_id=eos)
    model2 = create_model(name, cfg2)
    base2 = jax.device_get(jax.jit(lambda p, bt: model2.apply(
        {"params": p}, bt, max_len=max_len,
        method=type(model2).predict))(params, batch))
    np.testing.assert_array_equal(np.asarray(base2["answer"]), ids)
    return model2, params, arrays, ids, np.asarray(base["rank"]), eos


def _trim(row, eos):
    """Tokens up to and including the first EOS (what to_sentence keeps)."""
    idx = np.where(row == eos)[0]
    return row[: idx[0] + 1] if len(idx) else row


@pytest.mark.parametrize("name", ["case", "masque"])
def test_chunked_lockstep_matches_scan_decode(name):
    max_len = 12
    model, params, arrays, base_ids, base_rank, eos = \
        _models_with_live_eos(name, max_len)
    batch = {k: jnp.asarray(v) for k, v in arrays.items()}

    state, rank = jax.jit(lambda p, bt: model.apply(
        {"params": p}, bt, max_len=max_len,
        method=type(model).decode_init))(params, batch)
    np.testing.assert_allclose(np.asarray(rank), base_rank,
                               rtol=1e-6, atol=1e-7)
    chunk = jax.jit(lambda p, st: model.apply(
        {"params": p}, st, n_steps=3, method=type(model).decode_chunk))
    for _ in range(max_len // 3 + 1):
        state = chunk(params, state)
    out = np.asarray(jax.device_get(state["out"]))
    done = np.asarray(jax.device_get(state["done"]))
    assert done.all()
    trows = np.asarray(jax.device_get(state["trow"]))
    assert len(set(trows.tolist())) > 1, \
        "rows finished in lockstep; EOS staggering did not occur"
    for r in range(out.shape[0]):
        np.testing.assert_array_equal(_trim(out[r], eos),
                                      _trim(base_ids[r], eos), err_msg=f"row {r}")


def test_refill_rows_scatters_fresh_state():
    max_len = 12
    model, params, arrays, base_ids, base_rank, eos = \
        _models_with_live_eos("case", max_len)
    from case_rg_tpu.runtime.continuous import refill_rows

    b = arrays["query"].shape[0]
    batch_a = {k: jnp.asarray(v[: b // 2]) for k, v in arrays.items()}
    batch_b = {k: jnp.asarray(v[b // 2:]) for k, v in arrays.items()}
    init = jax.jit(lambda p, bt: model.apply(
        {"params": p}, bt, max_len=max_len, method=type(model).decode_init))
    chunk = jax.jit(lambda p, st, n: model.apply(
        {"params": p}, st, n_steps=n, method=type(model).decode_chunk),
        static_argnums=2)

    # decode batch A for 5 steps, then replace rows [1, 3] with rows
    # [0, 1] of freshly encoded batch B — the replaced rows must decode
    # exactly like batch B's rows did in their own one-shot run.
    state, _ = init(params, batch_a)
    state = chunk(params, state, 5)
    new_state, _ = init(params, batch_b)
    rows = jnp.asarray([1, 3, b, b], jnp.int32)  # pad entries dropped
    state = jax.jit(refill_rows)(state, new_state, rows)
    for _ in range(max_len // 3 + 3):
        state = chunk(params, state, 3)
    out = np.asarray(jax.device_get(state["out"]))
    done = np.asarray(jax.device_get(state["done"]))
    assert done[:4].all()
    np.testing.assert_array_equal(_trim(out[1], eos),
                                  _trim(base_ids[b // 2 + 0], eos))
    np.testing.assert_array_equal(_trim(out[3], eos),
                                  _trim(base_ids[b // 2 + 1], eos))
    # untouched rows keep batch A's results
    np.testing.assert_array_equal(_trim(out[0], eos), _trim(base_ids[0], eos))
    np.testing.assert_array_equal(_trim(out[2], eos), _trim(base_ids[2], eos))


def _protocol_batch(name, rng, b=8):
    lc, lb, p, lp = 10, 20, 3, 12
    batch = {"context": jnp.asarray(
        np.concatenate([rng.randint(4, V, size=(b, lc - 2)),
                        np.zeros((b, 2))], 1).astype(np.int32))}
    if name == "tmemnet":
        pa = rng.randint(4, V, size=(b, p, lp)).astype(np.int32)
        pa[:, :, -3:] = 0
        batch["passage"] = jnp.asarray(pa)
    else:
        bg = rng.randint(4, V, size=(b, lb)).astype(np.int32)
        bg[:, -4:] = 0
        batch["background"] = jnp.asarray(bg)
    return batch


def _protocol_init(model, name, batch, rng_np):
    b = batch["context"].shape[0]
    init_batch = dict(batch,
                      response=jnp.asarray(
                          rng_np.randint(4, V, size=(b, 6)).astype(np.int32)),
                      sample_weight=jnp.ones((b,), jnp.float32))
    if name == "tmemnet":
        init_batch["passage_label"] = jnp.zeros((b,), jnp.int32)
    if name == "glks":
        lb = batch["background"].shape[1]
        n_w = (lb - 4) // 4 + 1
        sel = rng_np.rand(b, n_w).astype(np.float32)
        init_batch["selection"] = jnp.asarray(sel / sel.sum(-1, keepdims=True))
    return model.init({"params": jax.random.PRNGKey(0),
                       "dropout": jax.random.PRNGKey(1)},
                      init_batch, method=type(model).train_losses)["params"]


@pytest.mark.parametrize("name", ["s2sa", "gttp", "glks", "tmemnet"])
def test_protocol_chunked_matches_run_greedy(name):
    """EncDec-protocol models through the generic chunk driver
    (models/predict.continuous_decode_init/chunk): rows must reproduce the
    one-shot run_greedy output EXACTLY, including the reference EOS
    bookkeeping (UNK rewrite at step 0, PAD after EOS)."""
    import dataclasses

    from case_rg_tpu.models.predict import greedy_predict
    from case_rg_tpu.runtime.continuous import make_continuous_fns

    max_len = 8
    cfg = ModelConfig(name=name, vocab_size=V, embedding_size=16,
                      hidden_size=16, num_heads=2, max_dec_len=max_len)
    model = create_model(name, cfg)
    rng = np.random.RandomState(11)
    batch = _protocol_batch(name, rng)
    params = _protocol_init(model, name, batch, rng)

    probe = np.asarray(greedy_predict(model, {"params": params}, batch,
                                      max_len))
    vals, counts = np.unique(probe[probe != 0], return_counts=True)
    eos = int(vals[np.argmax(counts)])
    model = create_model(name, dataclasses.replace(cfg, eos_id=eos))
    base = np.asarray(jax.jit(lambda p, bt: greedy_predict(
        model, {"params": p}, bt, max_len))(params, batch))

    init_fn, chunk_fn, refill_fn = make_continuous_fns(model, max_len,
                                                       chunk_steps=3)
    state, rank = init_fn({"params": params}, batch)
    if name == "tmemnet":
        assert rank is not None and rank.shape == (8, 3)
    else:
        assert rank is None
    for _ in range(max_len // 3 + 1):
        state = chunk_fn({"params": params}, state)
    assert np.asarray(state["done"]).all()
    trows = np.asarray(jax.device_get(state["trow"]))
    assert len(set(trows.tolist())) > 1, "no EOS staggering"
    np.testing.assert_array_equal(np.asarray(state["out"]), base)


def test_lazy_rank_survives_donating_chunk():
    """_LazyRank safety contract (runtime/continuous.py fill): for EncDec
    models the rank returned by init_fn is the same traced value as
    state['enc']['ck_attn'] (models/predict.py:108), and later chunk_fn
    calls DONATE the state — jit must materialize duplicated outputs as
    distinct buffers for the lazy handle to survive. Guards refactors from
    returning an aliased/donated leaf as rank."""
    from case_rg_tpu.runtime.continuous import (_LazyRank,
                                                make_continuous_fns)

    max_len = 8
    cfg = ModelConfig(name="tmemnet", vocab_size=V, embedding_size=16,
                      hidden_size=16, num_heads=2, max_dec_len=max_len)
    model = create_model("tmemnet", cfg)
    rng = np.random.RandomState(13)
    batch = _protocol_batch("tmemnet", rng)
    params = _protocol_init(model, "tmemnet", batch, rng)

    init_fn, chunk_fn, _ = make_continuous_fns(model, max_len,
                                               chunk_steps=3)  # donating
    state, rank = init_fn({"params": params}, batch)
    assert rank is not None
    expected = np.asarray(jax.device_get(rank))
    lazy = _LazyRank(rank)
    state = chunk_fn({"params": params}, state)   # donates its input state
    state = chunk_fn({"params": params}, state)
    got = np.stack([lazy.row(i) for i in range(expected.shape[0])])
    np.testing.assert_array_equal(got, expected)


def test_protocol_refill_matches_own_run():
    """TMemNet (per-row t state): rows refilled mid-flight decode exactly
    as in their own one-shot run."""
    import dataclasses

    from case_rg_tpu.models.predict import greedy_predict
    from case_rg_tpu.runtime.continuous import make_continuous_fns

    max_len = 8
    name = "tmemnet"
    cfg = ModelConfig(name=name, vocab_size=V, embedding_size=16,
                      hidden_size=16, num_heads=2, max_dec_len=max_len)
    model = create_model(name, cfg)
    rng = np.random.RandomState(13)
    batch = _protocol_batch(name, rng)
    params = _protocol_init(model, name, batch, rng)
    probe = np.asarray(greedy_predict(model, {"params": params}, batch,
                                      max_len))
    vals, counts = np.unique(probe[probe != 0], return_counts=True)
    eos = int(vals[np.argmax(counts)])
    model = create_model(name, dataclasses.replace(cfg, eos_id=eos))
    base = np.asarray(jax.jit(lambda p, bt: greedy_predict(
        model, {"params": p}, bt, max_len))(params, batch))

    init_fn, chunk_fn, refill_fn = make_continuous_fns(model, max_len,
                                                       chunk_steps=3)
    b = 8
    batch_a = {k: v[: b // 2] for k, v in batch.items()}
    batch_b = {k: v[b // 2:] for k, v in batch.items()}
    state, _ = init_fn({"params": params}, batch_a)
    state = chunk_fn({"params": params}, state)   # 3 steps in
    new_state, _ = init_fn({"params": params}, batch_b)
    rows = jnp.asarray([0, 2, b, b], jnp.int32)
    state = refill_fn(state, new_state, rows)
    for _ in range(max_len // 3 + 2):
        state = chunk_fn({"params": params}, state)
    out = np.asarray(state["out"])
    np.testing.assert_array_equal(out[0], base[b // 2 + 0])
    np.testing.assert_array_equal(out[2], base[b // 2 + 1])
    np.testing.assert_array_equal(out[1], base[1])
    np.testing.assert_array_equal(out[3], base[3])


def test_row_max_caps_multimem_and_protocol():
    """Per-row response caps (requests' max_tokens -> batch response_cap):
    each row ends at its own cap; emitted tokens equal the uncapped
    decode's prefix (greedy prefixes don't depend on later steps)."""
    import dataclasses

    max_len = 12
    model, params, arrays, base_ids, _, eos = \
        _models_with_live_eos("case", max_len)
    b = arrays["query"].shape[0]
    caps = np.asarray([2, 5, 1, 12, 3, 12, 4, 2], np.int32)
    batch = {k: jnp.asarray(v) for k, v in arrays.items()}
    batch["response_cap"] = jnp.asarray(caps)
    init = jax.jit(lambda p, bt: model.apply(
        {"params": p}, bt, max_len=max_len, method=type(model).decode_init))
    chunk = jax.jit(lambda p, st: model.apply(
        {"params": p}, st, n_steps=3, method=type(model).decode_chunk))
    state, _ = init(params, batch)
    for _ in range(max_len // 3 + 1):
        state = chunk(params, state)
    assert np.asarray(state["done"]).all()
    out = np.asarray(state["out"])
    for r in range(b):
        capped = base_ids[r][:caps[r]]
        # the row may also have stopped earlier at EOS
        expect = _trim(capped, eos)
        np.testing.assert_array_equal(out[r][:len(expect)], expect,
                                      err_msg=f"row {r}")
        assert (out[r][len(expect):] == 0).all(), f"row {r} ran past cap"

    # protocol model (s2sa), through the generic driver
    from case_rg_tpu.models.predict import greedy_predict
    from case_rg_tpu.runtime.continuous import make_continuous_fns

    max_len = 8
    cfg = ModelConfig(name="s2sa", vocab_size=V, embedding_size=16,
                      hidden_size=16, num_heads=2, max_dec_len=max_len)
    pmodel = create_model("s2sa", cfg)
    rng = np.random.RandomState(17)
    pbatch = _protocol_batch("s2sa", rng)
    pparams = _protocol_init(pmodel, "s2sa", pbatch, rng)
    probe = np.asarray(greedy_predict(pmodel, {"params": pparams}, pbatch,
                                      max_len))
    vals, counts = np.unique(probe[probe != 0], return_counts=True)
    eos2 = int(vals[np.argmax(counts)])
    pmodel = create_model("s2sa", dataclasses.replace(cfg, eos_id=eos2))
    pbase = np.asarray(jax.jit(lambda p, bt: greedy_predict(
        pmodel, {"params": p}, bt, max_len))(pparams, pbatch))
    pcaps = np.asarray([1, 3, 8, 2, 5, 8, 4, 1], np.int32)
    pbatch2 = dict(pbatch, response_cap=jnp.asarray(pcaps))
    init_fn, chunk_fn, _ = make_continuous_fns(pmodel, max_len, chunk_steps=3)
    st, _ = init_fn({"params": pparams}, pbatch2)
    for _ in range(max_len // 3 + 1):
        st = chunk_fn({"params": pparams}, st)
    pout = np.asarray(st["out"])
    for r in range(pout.shape[0]):
        expect = _trim(pbase[r][:pcaps[r]], eos2)
        np.testing.assert_array_equal(pout[r][:len(expect)], expect,
                                      err_msg=f"s2sa row {r}")
        assert (pout[r][len(expect):] == 0).all()


def test_run_continuous_end_to_end():
    """The serving driver: staggered refills over a 4-slot state, answers
    equal to the one-shot batch predict, emitted in arrival order."""
    max_len = 12
    model, params, arrays, base_ids, base_rank, eos = \
        _models_with_live_eos("case", max_len)
    from case_rg_tpu.runtime.continuous import (make_continuous_fns,
                                                run_continuous)

    n = arrays["query"].shape[0]
    requests = [{"i": i} for i in range(n)]

    def make_batch(chunkreqs, bs):
        idx = [r["i"] for r in chunkreqs]
        idx = idx + [idx[-1]] * (bs - len(idx))
        return {k: jnp.asarray(v[idx]) for k, v in arrays.items()}

    init_fn, chunk_fn, refill_fn = make_continuous_fns(model, max_len,
                                                       chunk_steps=3)
    got = []
    stats = run_continuous(iter(requests), make_batch, init_fn, chunk_fn,
                           refill_fn, {"params": params}, batch_size=4,
                           refill=2, emit=lambda r, ids, rk:
                           got.append((r["i"], ids.copy(), rk.copy())),
                           max_len=max_len)
    assert stats["served"] == n
    assert stats["refills"] >= 1
    assert [g[0] for g in got] == list(range(n)), "arrival order violated"
    for i, ids, rk in got:
        np.testing.assert_array_equal(_trim(ids, eos), _trim(base_ids[i], eos),
                                      err_msg=f"request {i}")
        np.testing.assert_allclose(rk, base_rank[i], rtol=1e-6, atol=1e-7)

    # lookahead mode (one chunk dispatched ahead, non-donated state):
    # identical emissions, refills just land a chunk later
    la_fns = make_continuous_fns(model, max_len, chunk_steps=3,
                                 donate_state=False)
    got2 = []
    stats2 = run_continuous(iter(requests), make_batch, *la_fns,
                            {"params": params}, 4, 2,
                            emit=lambda r, ids, rk:
                            got2.append((r["i"], ids.copy(), rk.copy())),
                            max_len=max_len, lookahead=True)
    assert stats2["served"] == n
    assert [g[0] for g in got2] == [g[0] for g in got]
    for (i, ids, rk), (i2, ids2, rk2) in zip(got, got2):
        np.testing.assert_array_equal(_trim(ids2, eos), _trim(ids, eos),
                                      err_msg=f"lookahead request {i}")
        np.testing.assert_allclose(rk2, rk, rtol=0, atol=0)

    # async_harvest (harvest-first pipelined rounds: flags ride an async
    # copy read one round later; freed slots refill before the next
    # chunk; refilled slots protected by snapshot identity): identical
    # emissions. Runs with the DEFAULT donating fns — every buffer is
    # harvested before the refill/chunk that consumes it.
    got_ah = []
    stats_ah = run_continuous(iter(requests), make_batch, init_fn, chunk_fn,
                              refill_fn, {"params": params}, 4, 2,
                              emit=lambda r, ids, rk:
                              got_ah.append((r["i"], ids.copy(), rk.copy())),
                              max_len=max_len, async_harvest=True)
    assert stats_ah["served"] == n
    assert [g[0] for g in got_ah] == [g[0] for g in got]
    for (i, ids, rk), (ia, idsa, rka) in zip(got, got_ah):
        np.testing.assert_array_equal(_trim(idsa, eos), _trim(ids, eos),
                                      err_msg=f"async_harvest request {i}")
        np.testing.assert_allclose(rka, rk, rtol=0, atol=0)
    # lookahead flag composes (ignored in ah mode) — same emissions
    got_ah2 = []
    run_continuous(iter(requests), make_batch, *la_fns,
                   {"params": params}, 4, 2,
                   emit=lambda r, ids, rk:
                   got_ah2.append((r["i"], ids.copy(), rk.copy())),
                   max_len=max_len, lookahead=True, async_harvest=True)
    assert [g[0] for g in got_ah2] == [g[0] for g in got]

    # coalesced refills (refill_min=refill width): identical per-request
    # answers; every mid-flight refill waits for a full refill bucket, so
    # refill count can only drop
    got3 = []
    stats3 = run_continuous(iter(requests), make_batch, init_fn, chunk_fn,
                            refill_fn, {"params": params}, 4, 2,
                            emit=lambda r, ids, rk:
                            got3.append((r["i"], ids.copy(), rk.copy())),
                            max_len=max_len, refill_min=2)
    assert stats3["served"] == n
    assert stats3["refills"] <= stats["refills"]
    assert [g[0] for g in got3] == [g[0] for g in got]
    for (i, ids, rk), (i3, ids3, rk3) in zip(got, got3):
        np.testing.assert_array_equal(_trim(ids3, eos), _trim(ids, eos),
                                      err_msg=f"refill_min request {i}")
        np.testing.assert_allclose(rk3, rk, rtol=0, atol=0)


def test_run_continuous_multi_lanes():
    """Multi-lane driver (--pool_buckets x --continuous): two lanes at
    different pool sizes share the jitted fns (jit caches one executable
    per state shape); requests route by pool size, refill mid-flight, and
    every answer/ranking equals the request's one-shot predict at ITS
    pool size, emitted in global arrival order."""
    max_len = 12
    model, params, arrays, base3, rank3, eos = \
        _models_with_live_eos("case", max_len)
    # a 2-passage variant of the same requests (the compact lane)
    arrays2 = {"query": arrays["query"], "passage": arrays["passage"][:, :2]}
    out2 = jax.device_get(jax.jit(lambda p, bt: model.apply(
        {"params": p}, bt, max_len=max_len, method=type(model).predict))(
        params, {k: jnp.asarray(v) for k, v in arrays2.items()}))
    base2, rank2 = np.asarray(out2["answer"]), np.asarray(out2["rank"])

    from case_rg_tpu.runtime.continuous import (Lane, make_continuous_fns,
                                                run_continuous_multi)
    init_fn, chunk_fn, refill_fn = make_continuous_fns(model, max_len,
                                                       chunk_steps=3)

    n = arrays["query"].shape[0]
    requests = [{"i": i, "k": 3 if i % 2 == 0 else 2} for i in range(n)]

    def mb_for(k):
        src = arrays if k == 3 else arrays2

        def mb(chunkreqs, bs):
            idx = [r["i"] for r in chunkreqs]
            idx = idx + [idx[-1]] * (bs - len(idx))
            return {kk: jnp.asarray(v[idx]) for kk, v in src.items()}
        return mb

    lanes = {k: Lane(k, mb_for(k), init_fn, chunk_fn, refill_fn,
                     batch_size=2, refill=1) for k in (2, 3)}
    got = []
    stats = run_continuous_multi(
        iter(requests), list(lanes.values()), lambda r: lanes[r["k"]],
        {"params": params},
        emit=lambda r, ids, rk: got.append((r["i"], r["k"], ids.copy(),
                                            rk.copy())))
    assert stats["served"] == n
    assert stats["refills"] >= 1
    assert [g[0] for g in got] == list(range(n)), "arrival order violated"
    for i, k, ids, rk in got:
        base, rank = (base3, rank3) if k == 3 else (base2, rank2)
        np.testing.assert_array_equal(_trim(ids, eos), _trim(base[i], eos),
                                      err_msg=f"request {i} lane {k}")
        np.testing.assert_allclose(rk, rank[i], rtol=1e-6, atol=1e-7)

    # async_harvest analogue (harvest-first pipelined rounds per lane:
    # flags ride a copy_to_host_async read one round later, snapshot
    # identity protects refilled slots): identical emissions with the
    # same DONATING fns — each lane's landed copy is read before the
    # lane's next refill/chunk dispatch
    lanes_ah = {k: Lane(k, mb_for(k), init_fn, chunk_fn, refill_fn,
                        batch_size=2, refill=1) for k in (2, 3)}
    got_ah = []
    stats_ah = run_continuous_multi(
        iter(requests), list(lanes_ah.values()), lambda r: lanes_ah[r["k"]],
        {"params": params},
        emit=lambda r, ids, rk: got_ah.append((r["i"], r["k"], ids.copy(),
                                               rk.copy())),
        async_harvest=True)
    assert stats_ah["served"] == n
    assert [(g[0], g[1]) for g in got_ah] == [(g[0], g[1]) for g in got]
    for (i, k, ids, rk), (ia, ka, idsa, rka) in zip(got, got_ah):
        np.testing.assert_array_equal(_trim(idsa, eos), _trim(ids, eos),
                                      err_msg=f"ah request {i} lane {k}")
        np.testing.assert_allclose(rka, rk, rtol=0, atol=0)


def _row_keys(n, seed=5):
    return np.stack([np.random.SeedSequence([seed, i]).generate_state(
        2, np.uint32) for i in range(n)])


def test_sampled_chunks_topk1_matches_batch_sample():
    """Sampled continuous decoding, multimem (CaSE): with top_k=1 the
    categorical is key-independent (all mass on the argmax), so chunked
    sampling must reproduce the batch ``sample`` path bit-for-bit —
    including the UNK rewrite at a row's step 0, the forced EOS at the
    row's last step, and PAD after EOS."""
    max_len = 12
    model, params, arrays, _, _, eos = _models_with_live_eos("case", max_len)
    n = arrays["query"].shape[0]
    batch = {k: jnp.asarray(v) for k, v in arrays.items()}
    base = np.asarray(jax.device_get(jax.jit(
        lambda p, bt: model.apply({"params": p}, bt, max_len=max_len,
                                  sample_rng=jax.random.PRNGKey(0),
                                  top_k=1, method=type(model).predict))(
        params, batch))["answer"])

    from case_rg_tpu.runtime.continuous import make_continuous_fns
    init_fn, chunk_fn, _ = make_continuous_fns(model, max_len, chunk_steps=3,
                                               decoding="sample", top_k=1)
    batch_k = dict(batch, sample_key=jnp.asarray(_row_keys(n)))
    st, _ = init_fn({"params": params}, batch_k)
    for _ in range(max_len // 3 + 1):
        st = chunk_fn({"params": params}, st)
    assert np.asarray(st["done"]).all()
    np.testing.assert_array_equal(np.asarray(st["out"]), base)

    # missing sample_key is rejected up front
    with pytest.raises(ValueError, match="sample_key"):
        init_fn({"params": params}, batch)


def test_sampled_continuous_composition_invariance():
    """Real sampling (no controls): per-request keys ride with the rows,
    so sampled answers are identical across different batch sizes, chunk
    sizes, and refill staggering."""
    max_len = 12
    model, params, arrays, _, _, eos = _models_with_live_eos("case", max_len)
    from case_rg_tpu.runtime.continuous import (make_continuous_fns,
                                                run_continuous)

    n = arrays["query"].shape[0]
    keys = _row_keys(n, seed=9)
    requests = [{"i": i} for i in range(n)]

    def make_batch(chunkreqs, bs):
        idx = [r["i"] for r in chunkreqs]
        idx = idx + [idx[-1]] * (bs - len(idx))
        b = {k: jnp.asarray(v[idx]) for k, v in arrays.items()}
        b["sample_key"] = jnp.asarray(keys[idx])
        return b

    runs = []
    for bs, chunk, refill in ((4, 3, 2), (2, 5, 1)):
        fns = make_continuous_fns(model, max_len, chunk_steps=chunk,
                                  decoding="sample")
        got = []
        stats = run_continuous(iter(requests), make_batch, *fns,
                               {"params": params}, bs, refill,
                               emit=lambda r, ids, rk:
                               got.append((r["i"], ids.copy())),
                               max_len=max_len)
        assert stats["served"] == n
        runs.append(dict(got))
    assert sorted(runs[0]) == list(range(n))
    for i in range(n):
        np.testing.assert_array_equal(runs[0][i], runs[1][i],
                                      err_msg=f"request {i}")
    # sampling actually sampled (differs from greedy for at least one row)
    g_fns = make_continuous_fns(model, max_len, chunk_steps=3)
    st, _ = g_fns[0]({"params": params},
                     {k: jnp.asarray(v) for k, v in arrays.items()})
    for _ in range(max_len // 3 + 1):
        st = g_fns[1]({"params": params}, st)
    assert any(not np.array_equal(runs[0][i], np.asarray(st["out"])[i])
               for i in range(n))


def test_sampling_controls_rows_matches_scalar():
    """Per-row dynamic controls == the scalar pipeline applied row-wise
    (shared-sort equivalence incl. temperature/top-k/top-p composition)."""
    from case_rg_tpu.decode.loops import (sampling_controls,
                                          sampling_controls_rows)
    rng = np.random.RandomState(3)
    logits = jnp.asarray(rng.standard_normal((6, 50)).astype(np.float32) * 3)
    combos = [(1.0, 0, 1.0), (0.7, 0, 1.0), (1.0, 5, 1.0), (1.0, 0, 0.9),
              (0.5, 3, 0.8), (2.0, 1, 0.5)]
    temp = jnp.asarray([c[0] for c in combos], jnp.float32)
    topk = jnp.asarray([c[1] for c in combos], jnp.int32)
    topp = jnp.asarray([c[2] for c in combos], jnp.float32)
    got = np.asarray(sampling_controls_rows(logits, temp, topk, topp))
    for r, (t, k, p) in enumerate(combos):
        want = np.asarray(sampling_controls(logits[r:r + 1], t, k, p))[0]
        np.testing.assert_allclose(got[r], want, rtol=0, atol=0,
                                   err_msg=f"row {r} controls {t, k, p}")


def test_per_request_controls_ride_rows():
    """Per-row sampling controls (state['ctl']): rows carrying top_k=1
    must reproduce the batch sample(top_k=1) output even when OTHER rows
    in the same state sample with different controls."""
    max_len = 12
    model, params, arrays, _, _, eos = _models_with_live_eos("case", max_len)
    n = arrays["query"].shape[0]
    batch = {k: jnp.asarray(v) for k, v in arrays.items()}
    base = np.asarray(jax.device_get(jax.jit(
        lambda p, bt: model.apply({"params": p}, bt, max_len=max_len,
                                  sample_rng=jax.random.PRNGKey(0),
                                  top_k=1, method=type(model).predict))(
        params, batch))["answer"])

    from case_rg_tpu.runtime.continuous import make_continuous_fns
    ctl = np.tile(np.asarray([[1.0, 1.0, 1.0]], np.float32), (n, 1))
    ctl[n // 2:] = (0.7, 0.0, 0.9)   # different controls on the back half
    batch_k = dict(batch, sample_key=jnp.asarray(_row_keys(n)),
                   sample_ctl=jnp.asarray(ctl))
    init_fn, chunk_fn, _ = make_continuous_fns(model, max_len, chunk_steps=3,
                                               decoding="sample")
    st, _ = init_fn({"params": params}, batch_k)
    for _ in range(max_len // 3 + 1):
        st = chunk_fn({"params": params}, st)
    assert np.asarray(st["done"]).all()
    out = np.asarray(st["out"])
    np.testing.assert_array_equal(out[: n // 2], base[: n // 2])
    # the back half actually sampled under its own controls
    assert not np.array_equal(out[n // 2:], base[n // 2:])


def test_protocol_per_request_controls():
    """EncDec-protocol driver with per-row controls: all-top_k=1 control
    rows equal the controlled sample_predict(top_k=1) run."""
    from case_rg_tpu.models.predict import sample_predict
    from case_rg_tpu.runtime.continuous import make_continuous_fns

    max_len = 8
    cfg = ModelConfig(name="s2sa", vocab_size=V, embedding_size=16,
                      hidden_size=16, num_heads=2, max_dec_len=max_len)
    model = create_model("s2sa", cfg)
    rng = np.random.RandomState(29)
    batch = _protocol_batch("s2sa", rng)
    params = _protocol_init(model, "s2sa", batch, rng)
    base = np.asarray(jax.jit(lambda p, bt: sample_predict(
        model, {"params": p}, bt, max_len, jax.random.PRNGKey(0),
        top_k=1))(params, batch))

    n = batch["context"].shape[0]
    ctl = np.tile(np.asarray([[1.0, 1.0, 1.0]], np.float32), (n, 1))
    batch_k = dict(batch, sample_key=jnp.asarray(_row_keys(n, seed=4)),
                   sample_ctl=jnp.asarray(ctl))
    init_fn, chunk_fn, _ = make_continuous_fns(model, max_len, chunk_steps=3,
                                               decoding="sample")
    st, _ = init_fn({"params": params}, batch_k)
    for _ in range(max_len // 3 + 1):
        st = chunk_fn({"params": params}, st)
    np.testing.assert_array_equal(np.asarray(st["out"]), base)


def test_protocol_sampled_chunks_topk1_matches_run_sample():
    """EncDec-protocol model (s2sa) through the generic driver: top_k=1
    sampled chunks equal the one-shot sample_predict (run_sample
    bookkeeping: controlled branch, forced final EOS, PAD after EOS)."""
    from case_rg_tpu.models.predict import sample_predict
    from case_rg_tpu.runtime.continuous import make_continuous_fns

    max_len = 8
    cfg = ModelConfig(name="s2sa", vocab_size=V, embedding_size=16,
                      hidden_size=16, num_heads=2, max_dec_len=max_len)
    model = create_model("s2sa", cfg)
    rng = np.random.RandomState(23)
    batch = _protocol_batch("s2sa", rng)
    params = _protocol_init(model, "s2sa", batch, rng)
    base = np.asarray(jax.jit(lambda p, bt: sample_predict(
        model, {"params": p}, bt, max_len, jax.random.PRNGKey(0),
        top_k=1))(params, batch))

    n = batch["context"].shape[0]
    init_fn, chunk_fn, _ = make_continuous_fns(model, max_len, chunk_steps=3,
                                               decoding="sample", top_k=1)
    batch_k = dict(batch, sample_key=jnp.asarray(_row_keys(n, seed=3)))
    st, _ = init_fn({"params": params}, batch_k)
    for _ in range(max_len // 3 + 1):
        st = chunk_fn({"params": params}, st)
    assert np.asarray(st["done"]).all()
    np.testing.assert_array_equal(np.asarray(st["out"]), base)

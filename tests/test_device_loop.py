"""Device-resident continuous loop (runtime/continuous/device_loop):
in-jit harvest+refill between chunks must serve every request with
answers byte-identical (up to EOS trim) to the one-shot predict, ranks
bit-equal, in arrival order — across cold starts, mid-flight ring
refills, ring wrap-around, and sampled decoding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_continuous import (_models_with_live_eos, _protocol_batch,
                                   _protocol_init, _row_keys, _trim, V)
from case_rg_tpu.config import ModelConfig
from case_rg_tpu.models import create_model

MAX_LEN = 12


def _run(model, params, arrays, n, fns, b, refill, decoding="greedy",
         keys=None, lookahead=False):
    from case_rg_tpu.runtime.continuous.device_loop import \
        run_continuous_device

    requests = [{"i": i} for i in range(n)]

    def make_batch(chunkreqs, bs):
        idx = [r["i"] for r in chunkreqs]
        idx = idx + [idx[-1]] * (bs - len(idx))
        batch = {k: jnp.asarray(v[idx]) for k, v in arrays.items()}
        if decoding == "sample":
            batch["sample_key"] = jnp.asarray(keys[idx])
        return batch

    got = []
    stats = run_continuous_device(
        iter(requests), make_batch, fns, {"params": params},
        batch_size=b, refill=refill,
        emit=lambda r, ids, rk: got.append(
            (r["i"], ids.copy(), None if rk is None else rk.copy())),
        max_len=MAX_LEN, lookahead=lookahead)
    return got, stats


@pytest.mark.parametrize(
    "b,refill,stage,n_chunks,chunk_steps,lookahead,refill_cond", [
        (4, 2, 4, 2, 3, False, True),   # small ring, short megas
        (4, 2, 2, 4, 2, False, True),   # ring smaller than batch -> wrap
        (8, 3, 6, 3, 3, False, True),   # refill does not divide ring
        (4, 2, 4, 2, 3, True, True),    # double-dispatch (harvest lags)
        # unconditional drop-mode refill (the measured-refuted perf
        # variant, docs/PERF.md round 14) must stay numerics-identical
        (4, 2, 4, 2, 3, False, False),
        (8, 3, 6, 3, 3, True, False),
    ])
def test_device_loop_matches_predict(b, refill, stage, n_chunks,
                                     chunk_steps, lookahead, refill_cond):
    from case_rg_tpu.runtime.continuous.device_loop import \
        make_device_loop_fns

    model, params, arrays, base_ids, base_rank, eos = \
        _models_with_live_eos("case", MAX_LEN)
    n = arrays["query"].shape[0]
    fns = make_device_loop_fns(model, MAX_LEN, chunk_steps=chunk_steps,
                               n_chunks=n_chunks, stage_rows=stage,
                               refill_cond=refill_cond)
    got, stats = _run(model, params, arrays, n, fns, b, refill,
                      lookahead=lookahead)
    assert stats["served"] == n
    assert [g[0] for g in got] == list(range(n)), "arrival order violated"
    for i, ids, rk in got:
        np.testing.assert_array_equal(_trim(ids, eos),
                                      _trim(base_ids[i], eos),
                                      err_msg=f"request {i}")
        np.testing.assert_allclose(rk, base_rank[i], rtol=1e-6, atol=1e-7)
    if n > b:
        assert stats["refills"] >= 1


def test_device_loop_protocol_model():
    """EncDec-protocol model (tmemnet: per-row t, rank head) through the
    same driver."""
    import dataclasses

    from case_rg_tpu.models.predict import greedy_predict
    from case_rg_tpu.runtime.continuous.device_loop import \
        make_device_loop_fns

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

    arrays = {k: np.asarray(v) for k, v in batch.items()}
    n = arrays["context"].shape[0]
    fns = make_device_loop_fns(model, max_len, chunk_steps=3, n_chunks=2,
                               stage_rows=4)
    requests = [{"i": i} for i in range(n)]

    def make_batch(chunkreqs, bs):
        idx = [r["i"] for r in chunkreqs]
        idx = idx + [idx[-1]] * (bs - len(idx))
        return {k: jnp.asarray(v[idx]) for k, v in arrays.items()}

    from case_rg_tpu.runtime.continuous.device_loop import \
        run_continuous_device
    got = []
    stats = run_continuous_device(
        iter(requests), make_batch, fns, {"params": params},
        batch_size=4, refill=2,
        emit=lambda r, ids, rk: got.append((r["i"], ids.copy(), rk)),
        max_len=max_len)
    assert stats["served"] == n
    assert [g[0] for g in got] == list(range(n))
    for i, ids, rk in got:
        np.testing.assert_array_equal(ids, base[i], err_msg=f"req {i}")
        assert rk is not None and rk.shape == (3,)


def test_device_loop_sampled_composition_invariant():
    """Sampled decoding: per-row keys ride rows through the device loop,
    so sampled answers equal the host chunk loop's for the same keys."""
    from case_rg_tpu.runtime.continuous import (make_continuous_fns,
                                                run_continuous)
    from case_rg_tpu.runtime.continuous.device_loop import \
        make_device_loop_fns

    model, params, arrays, _, _, eos = _models_with_live_eos("case",
                                                             MAX_LEN)
    n = arrays["query"].shape[0]
    keys = _row_keys(n, seed=21)

    fns = make_device_loop_fns(model, MAX_LEN, chunk_steps=3, n_chunks=2,
                               stage_rows=4, decoding="sample")
    got, stats = _run(model, params, arrays, n, fns, 4, 2,
                      decoding="sample", keys=keys)
    assert stats["served"] == n

    # host chunk-loop reference with the same per-row keys
    requests = [{"i": i} for i in range(n)]

    def make_batch(chunkreqs, bs):
        idx = [r["i"] for r in chunkreqs]
        idx = idx + [idx[-1]] * (bs - len(idx))
        b = {k: jnp.asarray(v[idx]) for k, v in arrays.items()}
        b["sample_key"] = jnp.asarray(keys[idx])
        return b

    cfns = make_continuous_fns(model, MAX_LEN, chunk_steps=3,
                               decoding="sample")
    ref = []
    run_continuous(iter(requests), make_batch, *cfns, {"params": params},
                   4, 2, emit=lambda r, ids, rk: ref.append((r["i"],
                                                             ids.copy())),
                   max_len=MAX_LEN)
    ref = dict(ref)
    for i, ids, _ in got:
        np.testing.assert_array_equal(ids, ref[i], err_msg=f"request {i}")


def test_device_loop_request_controls():
    """Per-request sampling controls (temperature/top_k/top_p rows) ride
    the decode state through the device loop — answers equal the host
    chunk loop's for the same keys and controls (VERDICT r3 item 2), and
    a greedy-equivalent control row (top_k=1) matches the greedy decode."""
    from case_rg_tpu.runtime.continuous import (make_continuous_fns,
                                                run_continuous)
    from case_rg_tpu.runtime.continuous.device_loop import (
        make_device_loop_fns, run_continuous_device)

    model, params, arrays, base_ids, _, eos = _models_with_live_eos(
        "case", MAX_LEN)
    n = arrays["query"].shape[0]
    keys = _row_keys(n, seed=33)
    # per-request controls: rows 0,3,6.. run effectively greedy (top_k=1),
    # others mix temperatures and nucleus cutoffs
    ctls = np.asarray([(1.0, 1.0, 1.0) if i % 3 == 0 else
                       (0.7 + 0.1 * (i % 4), float(i % 5), 0.8 + 0.04 * (i % 5))
                       for i in range(n)], np.float32)

    def mb(chunkreqs, bs):
        idx = [r["i"] for r in chunkreqs]
        idx = idx + [idx[-1]] * (bs - len(idx))
        b = {k: jnp.asarray(v[idx]) for k, v in arrays.items()}
        b["sample_key"] = jnp.asarray(keys[idx])
        b["sample_ctl"] = jnp.asarray(ctls[idx])
        return b

    fns = make_device_loop_fns(model, MAX_LEN, chunk_steps=3, n_chunks=2,
                               stage_rows=4, decoding="sample")
    got = []
    requests = [{"i": i} for i in range(n)]
    stats = run_continuous_device(
        iter(requests), mb, fns, {"params": params}, batch_size=4,
        refill=2,
        emit=lambda r, ids, rk: got.append((r["i"], ids.copy())),
        max_len=MAX_LEN)
    assert stats["served"] == n

    cfns = make_continuous_fns(model, MAX_LEN, chunk_steps=3,
                               decoding="sample")
    ref = []
    run_continuous(iter([{"i": i} for i in range(n)]), mb, *cfns,
                   {"params": params}, 4, 2,
                   emit=lambda r, ids, rk: ref.append((r["i"], ids.copy())),
                   max_len=MAX_LEN)
    ref = dict(ref)
    for i, ids in got:
        np.testing.assert_array_equal(ids, ref[i], err_msg=f"request {i}")
        # top_k=1 collapses the categorical to argmax: rows whose greedy
        # decode ends on a natural EOS must match it exactly (rows that
        # hit max_len differ only in the sample path's forced final EOS)
        if i % 3 == 0 and eos in base_ids[i][:-1]:
            np.testing.assert_array_equal(
                _trim(ids, eos), _trim(base_ids[i], eos),
                err_msg=f"top_k=1 request {i} must match greedy")


def test_device_loop_trickle_arrivals():
    """Requests arriving in dribbles (QueueSource-like staggering via a
    generator that yields one at a time): everything is served exactly
    once, in arrival order."""
    from case_rg_tpu.runtime.continuous.device_loop import \
        make_device_loop_fns, run_continuous_device

    model, params, arrays, base_ids, base_rank, eos = \
        _models_with_live_eos("case", MAX_LEN)
    n = arrays["query"].shape[0]
    fns = make_device_loop_fns(model, MAX_LEN, chunk_steps=2, n_chunks=3,
                               stage_rows=2)

    def gen():
        for i in range(n):
            yield {"i": i}

    def make_batch(chunkreqs, bs):
        idx = [r["i"] for r in chunkreqs]
        idx = idx + [idx[-1]] * (bs - len(idx))
        return {k: jnp.asarray(v[idx]) for k, v in arrays.items()}

    got = []
    stats = run_continuous_device(
        gen(), make_batch, fns, {"params": params}, batch_size=3,
        refill=1,
        emit=lambda r, ids, rk: got.append((r["i"], ids.copy())),
        max_len=MAX_LEN)
    assert stats["served"] == n
    assert [g[0] for g in got] == list(range(n))
    for i, ids in got:
        np.testing.assert_array_equal(_trim(ids, eos),
                                      _trim(base_ids[i], eos),
                                      err_msg=f"request {i}")


def test_device_loop_dp_sharded_matches_unsharded():
    """The flagship serving mode on a device mesh (VERDICT r4 item 2):
    dp-shard the live decode state + ring over a ('data',) mesh and run
    the same driver — every request's answer/rank must match the
    unsharded run (the reference's analogue is per-rank eval sharding,
    common/CumulativeTrainer.py:139-152; here it is one SPMD program
    instead of per-process shards)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from case_rg_tpu.runtime.continuous.device_loop import \
        make_device_loop_fns

    model, params, arrays, base_ids, base_rank, eos = \
        _models_with_live_eos("case", MAX_LEN)
    n = arrays["query"].shape[0]
    b, refill, stage, n_chunks, chunk_steps = 4, 2, 4, 2, 3
    fns = make_device_loop_fns(model, MAX_LEN, chunk_steps=chunk_steps,
                               n_chunks=n_chunks, stage_rows=stage)

    # unsharded control
    got0, stats0 = _run(model, params, arrays, n, fns, b, refill)

    # dp=2 mesh: batch rows (and thus the wrap/ring state jit derives
    # from them) shard over 'data'; params replicate
    ndev = min(2, jax.device_count())
    mesh = Mesh(np.array(jax.devices()[:ndev]), ("data",))
    repl = NamedSharding(mesh, P())
    params_sh = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, repl), params)

    def make_batch(chunkreqs, bs):
        idx = [r["i"] for r in chunkreqs]
        idx = idx + [idx[-1]] * (bs - len(idx))
        return {k: jax.device_put(
            jnp.asarray(v[idx]),
            NamedSharding(mesh, P("data", *([None] * (v.ndim - 1)))))
            for k, v in arrays.items()}

    from case_rg_tpu.runtime.continuous.device_loop import \
        run_continuous_device
    got = []
    requests = [{"i": i} for i in range(n)]
    stats = run_continuous_device(
        iter(requests), make_batch, fns, {"params": params_sh},
        batch_size=b, refill=refill,
        emit=lambda r, ids, rk: got.append(
            (r["i"], ids.copy(), None if rk is None else rk.copy())),
        max_len=MAX_LEN)
    assert stats["served"] == n
    assert [g[0] for g in got] == [g[0] for g in got0]
    for (i, ids, rk), (_, ids0, rk0) in zip(got, got0):
        np.testing.assert_array_equal(_trim(ids, eos), _trim(ids0, eos),
                                      err_msg=f"request {i}")
        np.testing.assert_allclose(rk, rk0, rtol=1e-6, atol=1e-7)
        np.testing.assert_array_equal(_trim(ids, eos),
                                      _trim(base_ids[i], eos))

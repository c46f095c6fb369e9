"""Fused decoder-stack decode step (kernels/decoder_stack.py): the folded
Pallas kernel must decode the same tokens as the per-layer XLA chain, on
the one-shot scan decode AND the refillable chunked path (interpret mode
on CPU; the TPU timing evidence lives in docs/PERF.md round 10)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from case_rg_tpu.kernels import decoder_stack as ds
from case_rg_tpu.models import multimem
from case_rg_tpu.ops.transformer import Decoder


@pytest.fixture
def force_fused():
    ds._FORCE_INTERPRET = True
    multimem.set_fused_stack(True)
    yield
    ds._FORCE_INTERPRET = False
    multimem.set_fused_stack(None)


def test_stack_step_matches_decoder_step():
    """Kernel vs ops.transformer.Decoder.step over a multi-step
    self-feeding decode, caches included (f32, interpret)."""
    e, h, nl, t_max, b, l = 32, 4, 2, 6, 4, 24
    dec = Decoder(nl, e, h, d_ff=e, dropout=0.0, activation="gelu")
    k = jax.random.PRNGKey(0)
    m = jax.random.normal(k, (b, l, e), jnp.float32)
    x = jax.random.normal(jax.random.fold_in(k, 1), (b, 1, e), jnp.float32)
    params = dec.init(k, x, m, None, None, deterministic=True)["params"]
    mem_keep = jax.random.uniform(jax.random.fold_in(k, 2), (b, l)) > 0.2

    cross = dec.apply({"params": params}, m, method=Decoder.precompute_memory)
    caches = dec.apply({"params": params}, b, t_max, jnp.float32,
                       method=Decoder.init_cache)
    folded = ds.fold_stack_weights(params, nl, h, jnp.float32)
    cstack = jnp.stack(caches, axis=1)          # batch-leading [B, nl, T, 2E]
    hist = jnp.zeros((b, t_max), bool)
    xc = xk = x
    for t in range(4):
        hist = hist.at[:, t].set(True)
        y_ref, caches = dec.apply({"params": params}, xc, jnp.int32(t),
                                  caches, cross, hist, mem_keep,
                                  method=Decoder.step)
        y_k, cstack = ds.stack_step(xk[:, 0], jnp.int32(t), cstack, m,
                                    mem_keep, hist, folded, h,
                                    rows_per_block=2, interpret=True)
        np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_ref[:, 0]),
                                   rtol=0, atol=2e-4)
        xc, xk = y_ref, y_k[:, None, :]
    np.testing.assert_allclose(np.asarray(cstack),
                               np.asarray(jnp.stack(caches, axis=1)),
                               rtol=0, atol=2e-4)


def test_stack_step_per_row_t_skips_done_rows():
    """Per-row t (continuous batching): out-of-range rows must not write
    their cache slot (ops/cache.write_step drop semantics)."""
    e, h, nl, t_max, b, l = 32, 4, 2, 5, 4, 16
    dec = Decoder(nl, e, h, d_ff=e, dropout=0.0, activation="gelu")
    k = jax.random.PRNGKey(3)
    m = jax.random.normal(k, (b, l, e), jnp.float32)
    x = jax.random.normal(jax.random.fold_in(k, 1), (b, e), jnp.float32)
    params = dec.init(k, x[:, None], m, None, None,
                      deterministic=True)["params"]
    folded = ds.fold_stack_weights(params, nl, h, jnp.float32)
    caches0 = jnp.asarray(np.random.RandomState(0).randn(
        b, nl, t_max, 2 * e), jnp.float32)
    hist = jnp.ones((b, t_max), bool)
    mem_keep = jnp.ones((b, l), bool)
    t_rows = jnp.asarray([1, t_max, 2, t_max], jnp.int32)  # rows 1,3 done
    _, c = ds.stack_step(x, t_rows, caches0, m, mem_keep, hist, folded, h,
                         rows_per_block=2, interpret=True)
    c = np.asarray(c)
    c0 = np.asarray(caches0)
    # done rows (t == t_max): untouched; live rows: only their t row changed
    np.testing.assert_array_equal(c[1], c0[1])
    np.testing.assert_array_equal(c[3], c0[3])
    assert not np.array_equal(c[0, :, 1], c0[0, :, 1])
    np.testing.assert_array_equal(c[0, :, 0], c0[0, :, 0])
    np.testing.assert_array_equal(c[0, :, 2:], c0[0, :, 2:])
    assert not np.array_equal(c[2, :, 2], c0[2, :, 2])


def test_stack_step_vmem_adaptive_layer_chunk(monkeypatch):
    """When the per-call [B, lc, T, 2E] cache slice would exceed the
    scoped-VMEM bound, stack_step shrinks layers_per_call rather than
    letting XLA's VMEM promotion OOM at compile time (observed live at
    B=256 CaSE shapes). Forcing the shrink via a tiny bound must be
    numerically identical to the default layer chunking."""
    e, h, nl, t_max, b, l = 32, 4, 4, 6, 4, 24
    dec = Decoder(nl, e, h, d_ff=e, dropout=0.0, activation="gelu")
    k = jax.random.PRNGKey(7)
    m = jax.random.normal(k, (b, l, e), jnp.float32)
    x = jax.random.normal(jax.random.fold_in(k, 1), (b, e), jnp.float32)
    params = dec.init(k, x[:, None], m, None, None,
                      deterministic=True)["params"]
    folded = ds.fold_stack_weights(params, nl, h, jnp.float32)
    caches0 = jnp.zeros((b, nl, t_max, 2 * e), jnp.float32)
    hist = jnp.zeros((b, t_max), bool).at[:, 0].set(True)
    mem_keep = jnp.ones((b, l), bool)
    args = (x, jnp.int32(0), caches0, m, mem_keep, hist, folded, h)
    y2, c2 = ds.stack_step(*args, rows_per_block=2, layers_per_call=2,
                           interpret=True)
    monkeypatch.setattr(ds, "_VMEM_CACHE_BYTES", 1)   # force lc -> 1
    y1, c1 = ds.stack_step(*args, rows_per_block=2, layers_per_call=2,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2),
                               rtol=0, atol=1e-5)


def test_stack_step_batch_sharded():
    """The kernel's custom_partitioning rule: a batch-sharded jitted call
    on the 8-device mesh must equal the unsharded call, with the weight
    operands replicated per shard (the rule the data-parallel predict
    programs rely on — runtime/mesh.py)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    devs = np.array(jax.devices())
    if devs.size < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = Mesh(devs.reshape(devs.size), ("data",))
    e, h, nl, t_max, l = 32, 4, 2, 6, 24
    b = 2 * devs.size
    dec = Decoder(nl, e, h, d_ff=e, dropout=0.0, activation="gelu")
    k = jax.random.PRNGKey(5)
    m = jax.random.normal(k, (b, l, e), jnp.float32)
    x = jax.random.normal(jax.random.fold_in(k, 1), (b, e), jnp.float32)
    params = dec.init(k, x[:, None], m, None, None,
                      deterministic=True)["params"]
    folded = ds.fold_stack_weights(params, nl, h, jnp.float32)
    caches = jnp.zeros((b, nl, t_max, 2 * e), jnp.float32)
    hist = jnp.zeros((b, t_max), bool).at[:, 0].set(True)
    mem_keep = jnp.ones((b, l), bool)

    def run(xx, cc, mm, mk, hk):
        return ds.stack_step(xx, jnp.int32(0), cc, mm, mk, hk, folded, h,
                             rows_per_block=2, interpret=True)
    y_ref, c_ref = jax.jit(run)(x, caches, m, mem_keep, hist)
    sh2 = NamedSharding(mesh, P("data", None))
    put = lambda a: jax.device_put(
        a, NamedSharding(mesh, P("data", *([None] * (a.ndim - 1)))))
    y_sh, c_sh = jax.jit(run)(put(x), put(caches), put(m), put(mem_keep),
                              put(hist))
    assert y_sh.sharding.is_equivalent_to(sh2, 2)
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_sh), np.asarray(c_ref),
                               rtol=0, atol=1e-5)


@pytest.mark.parametrize("name", ["case", "masque"])
def test_fused_decode_matches_xla_chain(name, force_fused):
    """Whole-model greedy decode with the fused stacks forced on
    (interpret) decodes the same tokens as the XLA per-layer chain."""
    from tests.test_continuous import (_arrays, _init_params, V)
    from case_rg_tpu.config import ModelConfig
    from case_rg_tpu.models import create_model
    max_len = 8
    cfg = ModelConfig(name=name, vocab_size=V, embedding_size=16,
                      hidden_size=16, num_heads=2, enc_layers=1,
                      dec_layers=2, max_dec_len=max_len)
    model = create_model(name, cfg)
    rng = np.random.RandomState(11)
    arrays = _arrays(rng, 4)
    params = _init_params(model, arrays)
    batch = {k: jnp.asarray(v) for k, v in arrays.items()}

    def run():
        return np.asarray(jax.device_get(model.apply(
            {"params": params}, batch, max_len=max_len,
            method=type(model).predict)["answer"]))

    fused = run()
    multimem.set_fused_stack(False)
    plain = run()
    np.testing.assert_array_equal(fused, plain)


def test_fused_chunked_continuous_matches(force_fused):
    """Chunked decode with refill, fused stacks on: per-request answers
    equal the (fused) one-shot predict — the stacked caches ride the
    refillable state and scatter row-wise."""
    from tests.test_continuous import _models_with_live_eos, _trim
    from case_rg_tpu.runtime.continuous import (make_continuous_fns,
                                                run_continuous)
    max_len = 10
    model, params, arrays, base_ids, base_rank, eos = \
        _models_with_live_eos("case", max_len)
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
                           got.append((r["i"], ids.copy())),
                           max_len=max_len)
    assert stats["served"] == n and stats["refills"] >= 1
    for i, ids in got:
        np.testing.assert_array_equal(_trim(ids, eos),
                                      _trim(base_ids[i], eos),
                                      err_msg=f"fused chunked request {i}")

"""MultiHeadAttention parity vs torch.nn.MultiheadAttention."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax.numpy as jnp

from case_rg_tpu.ops.attention import MultiHeadAttention
from case_rg_tpu.ops.masking import causal_mask
from torch_helpers import mha_params


def _setup(embed=32, heads=4, seed=0):
    torch.manual_seed(seed)
    t_mha = torch.nn.MultiheadAttention(embed, heads, dropout=0.0)
    params = {"params": mha_params(t_mha)}
    mha = MultiHeadAttention(embed_dim=embed, num_heads=heads, dropout=0.0)
    return t_mha, mha, params


def test_self_attention_matches_torch():
    t_mha, mha, params = _setup()
    rng = np.random.RandomState(0)
    b, l, e = 3, 7, 32
    x = rng.randn(b, l, e).astype(np.float32)
    keep = rng.rand(b, l) > 0.3
    keep[:, 0] = True

    with torch.no_grad():
        xt = torch.tensor(x).transpose(0, 1)  # [L, B, E]
        ref, ref_w = t_mha(xt, xt, xt, key_padding_mask=torch.tensor(~keep))
        ref = ref.transpose(0, 1).numpy()
    out, w = mha.apply(params, jnp.array(x), jnp.array(x), jnp.array(x),
                       key_keep=jnp.array(keep), need_weights=True)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)
    np.testing.assert_allclose(np.asarray(w), ref_w.numpy(), atol=2e-5)


def test_causal_attention_matches_torch():
    t_mha, mha, params = _setup(seed=1)
    rng = np.random.RandomState(1)
    b, l, e = 2, 5, 32
    x = rng.randn(b, l, e).astype(np.float32)

    cm = torch.triu(torch.full((l, l), float("-inf")), diagonal=1)
    with torch.no_grad():
        xt = torch.tensor(x).transpose(0, 1)
        ref, _ = t_mha(xt, xt, xt, attn_mask=cm)
        ref = ref.transpose(0, 1).numpy()
    out, _ = mha.apply(params, jnp.array(x), jnp.array(x), jnp.array(x),
                       attn_bias=causal_mask(l))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_cross_attention_and_kv_cache_paths_agree():
    t_mha, mha, params = _setup(seed=2)
    rng = np.random.RandomState(2)
    b, lq, lk, e = 2, 4, 9, 32
    q = rng.randn(b, lq, e).astype(np.float32)
    m = rng.randn(b, lk, e).astype(np.float32)
    keep = rng.rand(b, lk) > 0.4
    keep[:, 0] = True

    with torch.no_grad():
        ref, _ = t_mha(torch.tensor(q).transpose(0, 1), torch.tensor(m).transpose(0, 1),
                       torch.tensor(m).transpose(0, 1), key_padding_mask=torch.tensor(~keep))
        ref = ref.transpose(0, 1).numpy()
    out, _ = mha.apply(params, jnp.array(q), jnp.array(m), jnp.array(m),
                       key_keep=jnp.array(keep))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)

    # precomputed-KV path must agree with the direct path
    k, v = mha.apply(params, jnp.array(m), method=MultiHeadAttention.project_kv)
    out2, _ = mha.apply(params, jnp.array(q), k, v, key_keep=jnp.array(keep),
                        method=MultiHeadAttention.attend_with_kv)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out), atol=1e-6)


def test_single_query_block_diagonal_scores():
    """attend_with_kv_merged's Lq==1 fast path (non-f32 only) computes
    scores as one batched [L,E]x[E,H] MXU matmul over a block-diagonal
    query (ops/attention.py). The longer contraction can re-associate the
    live terms (~1 ULP), so f32 — the parity dtype — must keep the plain
    per-head einsum: the gate is a trace-time dtype branch, checked here
    on the jaxpr (the block-diagonal build is the only eye/iota in the
    method). The bf16 result must stay within bf16 resolution of the
    general head-split path."""
    import jax

    _, mha, params = _setup(seed=5)
    rng = np.random.RandomState(5)
    b, lk, e = 3, 11, 32
    q = rng.randn(b, 1, e).astype(np.float32)
    m = rng.randn(b, lk, e).astype(np.float32)
    keep = rng.rand(b, lk) > 0.4
    keep[:, 0] = True
    k, v = mha.apply(params, jnp.array(m), method=MultiHeadAttention.project_kv)

    def merged(qx, kx, vx):
        return mha.apply(params, qx, kx, vx, key_keep=jnp.array(keep),
                         method=MultiHeadAttention.attend_with_kv_merged)

    # f32 (parity dtype): the block-diagonal trick must NOT be traced in
    jx32 = jax.make_jaxpr(merged)(jnp.array(q), k, v)
    assert "iota" not in repr(jx32), "lq==1 fast path leaked into f32"

    # bf16: fast path active, and within bf16 resolution of the general
    # path (params cast like --bf16_eval does, else project_q promotes to
    # f32 and the trace-time dtype gate correctly stays off)
    bparams = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    bq, bk, bv = (jnp.asarray(x, jnp.bfloat16) for x in (q, k, v))

    def bmerged(qx, kx, vx):
        return mha.apply(bparams, qx, kx, vx, key_keep=jnp.array(keep),
                         method=MultiHeadAttention.attend_with_kv_merged)

    jx16 = jax.make_jaxpr(bmerged)(bq, bk, bv)
    assert "iota" in repr(jx16), "lq==1 fast path inactive for bf16"
    out_bsq, _ = bmerged(bq, bk, bv)
    out_bgen, _ = mha.apply(bparams, bq, bk, bv, key_keep=jnp.array(keep),
                            method=MultiHeadAttention.attend_with_kv)
    np.testing.assert_allclose(np.asarray(out_bsq, np.float32),
                               np.asarray(out_bgen, np.float32), atol=0.05)


def test_fully_masked_rows_zero_not_nan():
    _, mha, params = _setup(seed=3)
    x = np.random.RandomState(3).randn(2, 4, 32).astype(np.float32)
    keep = np.zeros((2, 4), dtype=bool)  # nothing to attend to
    out, _ = mha.apply(params, jnp.array(x), jnp.array(x), jnp.array(x),
                       key_keep=jnp.array(keep))
    assert np.isfinite(np.asarray(out)).all()


def test_bf16_scores_opt_in():
    """set_bf16_scores(True): bf16 inputs keep bf16 scores (avoids the f32
    [B,H,L,L] materialization xprof flagged — docs/PERF.md round 4) and
    must stay close to the default f32-score result; f32 inputs are always
    f32-scored regardless of the switch (parity dtype unchanged)."""
    from case_rg_tpu.ops.attention import attend, set_bf16_scores

    rng = np.random.RandomState(7)
    q = rng.standard_normal((4, 2, 10, 16)).astype(np.float32)
    k = rng.standard_normal((4, 2, 12, 16)).astype(np.float32)
    v = rng.standard_normal((4, 2, 12, 16)).astype(np.float32)
    keep = np.arange(12)[None, :] < rng.randint(6, 13, size=(4,))[:, None]

    ref, _ = attend(jnp.array(q), jnp.array(k), jnp.array(v),
                    key_keep=jnp.array(keep))
    assert np.asarray(ref).dtype == np.float32

    bq, bk, bv = (jnp.array(x, jnp.bfloat16) for x in (q, k, v))
    base, _ = attend(bq, bk, bv, key_keep=jnp.array(keep))
    try:
        set_bf16_scores(True)
        fast, _ = attend(bq, bk, bv, key_keep=jnp.array(keep))
        f32_again, _ = attend(jnp.array(q), jnp.array(k), jnp.array(v),
                              key_keep=jnp.array(keep))
    finally:
        set_bf16_scores(False)
    assert fast.dtype == jnp.bfloat16
    # f32 path is bit-identical with the switch on
    np.testing.assert_array_equal(np.asarray(f32_again), np.asarray(ref))
    # bf16-scored output stays within bf16 resolution of the default
    np.testing.assert_allclose(np.asarray(fast, np.float32),
                               np.asarray(base, np.float32), atol=0.05)

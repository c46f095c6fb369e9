"""Pallas kernel tests (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from case_rg_tpu.kernels.additive_attention import (HAVE_PALLAS,
                                                    _scores_xla,
                                                    additive_scores)


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
def test_additive_scores_interpret_matches_xla():
    rng = np.random.RandomState(0)
    b, t, l, h = 2, 5, 37, 16   # deliberately non-tile-aligned t and l
    wq = jnp.asarray(rng.randn(b, t, h), jnp.float32)
    uh = jnp.asarray(rng.randn(b, l, h), jnp.float32)
    v = jnp.asarray(rng.randn(h), jnp.float32)
    ref = _scores_xla(wq, uh, v)
    out = additive_scores(wq, uh, v, True)  # interpret mode
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
def test_additive_scores_grad_matches_xla():
    rng = np.random.RandomState(1)
    b, t, l, h = 1, 3, 9, 8
    wq = jnp.asarray(rng.randn(b, t, h), jnp.float32)
    uh = jnp.asarray(rng.randn(b, l, h), jnp.float32)
    v = jnp.asarray(rng.randn(h), jnp.float32)

    def f_pallas(wq, uh, v):
        return jnp.sum(additive_scores(wq, uh, v, True) ** 2)

    def f_xla(wq, uh, v):
        return jnp.sum(_scores_xla(wq, uh, v) ** 2)

    gp = jax.grad(f_pallas, argnums=(0, 1, 2))(wq, uh, v)
    gx = jax.grad(f_xla, argnums=(0, 1, 2))(wq, uh, v)
    for a, b_ in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)


def test_single_query_mha_interpret_matches_xla():
    from case_rg_tpu.kernels.decode_attention import (single_query_mha,
                                                      single_query_mha_xla)
    rng = np.random.RandomState(2)
    b, l, e, h = 3, 700, 64, 4   # non-tile-aligned L
    q = jnp.asarray(rng.randn(b, 1, e), jnp.float32)
    k = jnp.asarray(rng.randn(b, l, e), jnp.float32)
    v = jnp.asarray(rng.randn(b, l, e), jnp.float32)
    keep = jnp.asarray(rng.rand(b, l) > 0.2)
    ref = single_query_mha_xla(q, k, v, keep, h)
    out = single_query_mha(q, k, v, keep, h, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # fully-masked row -> zeros, no NaN
    keep0 = keep.at[1].set(False)
    out0 = single_query_mha(q, k, v, keep0, h, True)
    assert np.isfinite(np.asarray(out0)).all()
    np.testing.assert_allclose(np.asarray(out0)[1], 0.0)

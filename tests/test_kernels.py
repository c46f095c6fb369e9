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

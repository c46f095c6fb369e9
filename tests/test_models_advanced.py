"""GLKS / TMemNet / Masque / CaSE model tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from case_rg_tpu.config import ModelConfig
from case_rg_tpu.models import create_model
from case_rg_tpu.models.predict import greedy_predict

V, E, H = 40, 16, 16
B, LQ, P, LP, T = 3, 8, 4, 10, 6


def _cfg(name, **kw):
    return ModelConfig(name=name, vocab_size=V, embedding_size=E, hidden_size=H,
                       num_heads=2, enc_layers=2, dec_layers=2, tmemnet_layers=2,
                       max_dec_len=T, min_window_size=4, num_windows=1, **kw)


def _rand_ids(rng, shape, pad_tail=0):
    ids = rng.randint(4, V, size=shape).astype(np.int32)
    if pad_tail:
        ids[..., -pad_tail:] = 0
    return ids


def _common(rng):
    resp = _rand_ids(rng, (B, T))
    resp[:, -1] = 3
    return resp, np.ones(B, np.float32)


def _glks_batch(rng):
    resp, w = _common(rng)
    bg = _rand_ids(rng, (B, P * LP), pad_tail=5)
    n_w = (P * LP - 4) // 4 + 1
    sel = rng.rand(B, n_w).astype(np.float32)
    sel /= sel.sum(-1, keepdims=True)
    return {"context": jnp.array(_rand_ids(rng, (B, LQ), pad_tail=2)),
            "background": jnp.array(bg), "response": jnp.array(resp),
            "selection": jnp.array(sel), "sample_weight": jnp.array(w)}


def _tmemnet_batch(rng):
    resp, w = _common(rng)
    return {"context": jnp.array(_rand_ids(rng, (B, LQ), pad_tail=2)),
            "passage": jnp.array(_rand_ids(rng, (B, P, LP), pad_tail=3)),
            "passage_label": jnp.array(rng.randint(0, P, size=B).astype(np.int32)),
            "response": jnp.array(resp), "sample_weight": jnp.array(w)}


def _masque_batch(rng):
    b = _tmemnet_batch(rng)
    b["query"] = jnp.array(_rand_ids(rng, (B, 1, LQ), pad_tail=2))
    del b["context"]
    return b


def _case_batch(rng):
    b = _masque_batch(rng)
    lab = (np.asarray(b["passage"]) != 0).astype(np.float32) * \
        (rng.rand(B, P, LP) > 0.5)
    b["token_label"] = jnp.array(lab.astype(np.float32))
    b["token_weight"] = jnp.array(np.where(lab > 0, 1.5, 1.0).astype(np.float32))
    return b


BATCHES = {"glks": _glks_batch, "tmemnet": _tmemnet_batch,
           "masque": _masque_batch, "case": _case_batch}


def _init(model, batch):
    return model.init({"params": jax.random.PRNGKey(0),
                       "dropout": jax.random.PRNGKey(1)},
                      batch, method=type(model).train_losses)


@pytest.mark.parametrize("name", ["glks", "tmemnet", "masque", "case"])
def test_losses_finite_and_trainable(name):
    rng = np.random.RandomState(0)
    batch = BATCHES[name](rng)
    model = create_model(name, _cfg(name))
    params = _init(model, batch)

    @jax.jit
    def loss_fn(p):
        losses = model.apply(p, batch, deterministic=True,
                             method=type(model).train_losses)
        return sum(losses.values()), losses

    @jax.jit
    def sgd(p):
        g = jax.grad(lambda q: loss_fn(q)[0])(p)
        return jax.tree_util.tree_map(lambda a, b: a - 0.3 * b, p, g)

    total, losses = loss_fn(params)
    assert np.isfinite(float(total)), losses
    p = params
    for _ in range(6):
        p = sgd(p)
    assert float(loss_fn(p)[0]) < float(total)


def test_glks_loss_components():
    rng = np.random.RandomState(1)
    batch = _glks_batch(rng)
    model = create_model("glks", _cfg("glks"))
    params = _init(model, batch)
    losses = model.apply(params, batch, deterministic=True,
                         method=type(model).train_losses)
    assert set(losses) == {"mle", "mce", "ds"}
    assert float(losses["ds"]) >= 0.0
    # method-substring selection (ref: GLKS/Model.py:264-279)
    only = model.apply(params, batch, deterministic=True, mode="mle_train",
                       method=type(model).train_losses)
    assert set(only) == {"mle"}
    np.testing.assert_allclose(float(only["mle"]), float(losses["mle"]), atol=1e-5)


def test_glks_tmemnet_greedy():
    rng = np.random.RandomState(2)
    for name in ("glks", "tmemnet"):
        batch = BATCHES[name](rng)
        model = create_model(name, _cfg(name))
        params = _init(model, batch)
        ids = greedy_predict(model, params, batch, max_len=T)
        assert ids.shape == (B, T)


@pytest.mark.parametrize("name", ["masque", "case"])
def test_masque_case_predict(name):
    rng = np.random.RandomState(3)
    batch = BATCHES[name](rng)
    model = create_model(name, _cfg(name))
    params = _init(model, batch)
    out = model.apply(params, batch, max_len=T, method=type(model).predict)
    assert out["answer"].shape == (B, T)
    assert out["rank"].shape == (B, P)
    assert np.isfinite(np.asarray(out["rank"])).all()


def test_tmemnet_hard_selection_uses_gold_at_train():
    rng = np.random.RandomState(4)
    batch = _tmemnet_batch(rng)
    model = create_model("tmemnet", _cfg("tmemnet"))
    params = _init(model, batch)
    enc_gold = model.apply(params, batch, batch["passage_label"],
                           method=type(model).encode)
    enc_pred = model.apply(params, batch, method=type(model).encode)
    # gold selection must select the labeled row of the knowledge encodings
    assert enc_gold["memory"].shape == enc_pred["memory"].shape
    ck = np.asarray(enc_pred["ck_attn"])
    assert ck.shape == (B, P)


def test_ps_train_modes():
    """Rank-only training modes (Masque/Model.py:244-258,
    TMemNet/Model.py:176-183)."""
    rng = np.random.RandomState(7)
    for name in ("masque", "tmemnet"):
        batch = BATCHES[name](rng)
        model = create_model(name, _cfg(name))
        params = _init(model, batch)
        losses = model.apply(params, batch, deterministic=True,
                             mode="ps_train", method=type(model).train_losses)
        assert set(losses) == {"select"}
        assert np.isfinite(float(losses["select"]))


def test_early_exit_decode_equivalence():
    """Early-exit decoding must produce identical ids up to each row's EOS
    and PAD afterwards (sentence-identical to the full scan)."""
    rng = np.random.RandomState(9)
    batch = _case_batch(rng)
    model = create_model("case", _cfg("case"))
    params = _init(model, batch)
    full = np.asarray(model.apply(params, batch, max_len=T,
                                  method=type(model).predict)["answer"])
    fast = np.asarray(model.apply(params, batch, max_len=T, early_exit=True,
                                  method=type(model).predict)["answer"])
    for fr, xr in zip(full, fast):
        for t in range(T):
            assert fr[t] == xr[t] or (xr[t] == 0)
            if fr[t] == 3:
                assert (xr[t + 1:] == 0).all()
                break


def test_fast_argmax_decode_agrees_with_scatter():
    """Candidate-set argmax must reproduce the scatter-based extended-dist
    argmax (exact up to measure-zero probability ties)."""
    rng = np.random.RandomState(11)
    batch = _case_batch(rng)
    model = create_model("case", _cfg("case"))
    params = _init(model, batch)
    slow = np.asarray(model.apply(params, batch, max_len=T,
                                  method=type(model).predict)["answer"])
    fast = np.asarray(model.apply(params, batch, max_len=T, fast_argmax=True,
                                  method=type(model).predict)["answer"])
    agreement = (slow == fast).mean()
    assert agreement >= 0.99, (agreement, slow, fast)


def test_fast_argmax_mode_strings():
    """The three-way --fast_argmax gate: "mxu" must force the matvec-combine
    candidate path even where the Pallas kernel is available (it used to be
    reachable only when Pallas was NOT), "pallas" must select the kernel,
    "dense"/"auto" the scatter; all decode identically (up to ties)."""
    import case_rg_tpu.kernels.copy_argmax as ca
    from case_rg_tpu.models.multimem import MultiMemoryDecoder

    rng = np.random.RandomState(29)
    batch = _case_batch(rng)
    model = create_model("case", _cfg("case"))
    params = _init(model, batch)

    dec = MultiMemoryDecoder(vocab_size=V, hidden_size=8, num_heads=2,
                             num_layers=1)
    ca._FORCE_INTERPRET = True
    try:
        # resolution: (fast_argmax bool, use_pallas_comb)
        assert dec._resolve_fast_argmax("mxu", None, jnp.float32) == \
            (True, False)
        assert dec._resolve_fast_argmax("pallas", None, jnp.float32) == \
            (True, True)
        assert dec._resolve_fast_argmax("dense", None, jnp.float32) == \
            (False, False)
        assert dec._resolve_fast_argmax("auto", None, jnp.float32) == \
            (False, False)
        assert dec._resolve_fast_argmax(True, None, jnp.float32) == \
            (True, True)
        with pytest.raises(ValueError):
            dec._resolve_fast_argmax("bogus", None, jnp.float32)

        dense = np.asarray(model.apply(params, batch, max_len=T,
                                       fast_argmax="dense",
                                       method=type(model).predict)["answer"])
        mxu = np.asarray(model.apply(params, batch, max_len=T,
                                     fast_argmax="mxu",
                                     method=type(model).predict)["answer"])
        pal = np.asarray(model.apply(params, batch, max_len=T,
                                     fast_argmax="pallas",
                                     method=type(model).predict)["answer"])
    finally:
        ca._FORCE_INTERPRET = False
    assert (dense == mxu).mean() >= 0.99, (dense, mxu)
    assert (dense == pal).mean() >= 0.99, (dense, pal)


def test_fast_argmax_flag_parser():
    """CLI --fast_argmax mode strings map onto the decoder gate values."""
    import argparse

    from case_rg_tpu.cli.flags import add_fast_argmax_flag
    p = argparse.ArgumentParser()
    add_fast_argmax_flag(p)
    assert p.parse_args([]).fast_argmax is None
    assert p.parse_args(["--fast_argmax"]).fast_argmax is True
    assert p.parse_args(["--fast_argmax", "mxu"]).fast_argmax == "mxu"
    assert p.parse_args(["--fast_argmax", "pallas"]).fast_argmax == "pallas"
    assert p.parse_args(["--fast_argmax", "dense"]).fast_argmax is False
    assert p.parse_args(["--fast_argmax", "auto"]).fast_argmax is None
    assert p.parse_args(["--no-fast_argmax"]).fast_argmax is False


@pytest.mark.parametrize("name", ["masque", "case"])
def test_multimem_beam_decode(name):
    """Beam search for the multi-memory decoders (capability beyond the
    reference); width=1 must follow the greedy argmax path."""
    rng = np.random.RandomState(13)
    batch = BATCHES[name](rng)
    model = create_model(name, _cfg(name))
    params = _init(model, batch)
    greedy = np.asarray(model.apply(params, batch, max_len=T,
                                    method=type(model).predict)["answer"])
    w1 = np.asarray(model.apply(params, batch, max_len=T, beam_width=1,
                                method=type(model).predict)["answer"])
    # width-1 beam follows the same argmax path up to the first EOS
    for g, b_ in zip(greedy, w1):
        for t in range(T):
            assert g[t] == b_[t]
            if g[t] == 3:
                break
    w3 = np.asarray(model.apply(params, batch, max_len=T, beam_width=3,
                                method=type(model).predict)["answer"])
    assert w3.shape == greedy.shape
    assert (w3 >= 0).all() and (w3 < V).all()


def _gttp_batch(rng):
    resp, w = _common(rng)
    return {"context": jnp.array(_rand_ids(rng, (B, LQ), pad_tail=2)),
            "background": jnp.array(_rand_ids(rng, (B, P * LP), pad_tail=5)),
            "response": jnp.array(resp), "sample_weight": jnp.array(w)}


BATCHES["gttp"] = _gttp_batch


@pytest.mark.parametrize("name", ["glks", "gttp"])
def test_decode_step_parts_matches_dense(name):
    """decode_step_parts recombined with the dense scatter must equal the
    decode_step distribution (the gate multiplies before the scatter-sum,
    so only f32 rounding order differs)."""
    from case_rg_tpu.ops.copynet import copy_scatter
    rng = np.random.RandomState(21)
    batch = BATCHES[name](rng)
    model = create_model(name, _cfg(name))
    params = _init(model, batch)
    enc = model.apply(params, batch, method=type(model).encode)
    state = enc["init_state"]
    prev = jnp.asarray(rng.randint(4, V, size=(B,)), jnp.int32)
    dense, _ = model.apply(params, enc, state, prev,
                           method=type(model).decode_step)
    base, cw, _ = model.apply(params, enc, state, prev,
                              method=type(model).decode_step_parts)
    recomb = base + copy_scatter(cw, enc["background"], V)
    np.testing.assert_allclose(np.asarray(recomb), np.asarray(dense),
                               atol=2e-6)


@pytest.mark.parametrize("name", ["glks", "gttp"])
def test_fast_copy_greedy_matches_dense(name):
    """The scatter-free candidate-argmax greedy loop (Pallas combine in
    interpret mode) must reproduce the dense-scatter greedy decode."""
    import case_rg_tpu.kernels.copy_argmax as ca
    rng = np.random.RandomState(22)
    batch = BATCHES[name](rng)
    model = create_model(name, _cfg(name))
    params = _init(model, batch)
    slow = np.asarray(greedy_predict(model, params, batch, T,
                                     fast_copy=False))
    ca._FORCE_INTERPRET = True
    try:
        fast = np.asarray(greedy_predict(model, params, batch, T,
                                         fast_copy=True))
    finally:
        ca._FORCE_INTERPRET = False
    agreement = (slow == fast).mean()
    assert agreement >= 0.99, (agreement, slow, fast)


@pytest.mark.parametrize("name", ["case", "masque"])
def test_multimem_pallas_fast_argmax_matches_dense(name):
    """The Pallas candidate-argmax decode (logits-at-ids via hoisted gen2
    columns + in-VMEM duplicate combine, interpret mode) must reproduce
    the dense-scatter greedy decode."""
    import case_rg_tpu.kernels.copy_argmax as ca
    rng = np.random.RandomState(23)
    batch = BATCHES[name](rng)
    model = create_model(name, _cfg(name))
    params = _init(model, batch)
    slow = np.asarray(model.apply(params, batch, max_len=T,
                                  fast_argmax=False,
                                  method=type(model).predict)["answer"])
    ca._FORCE_INTERPRET = True
    try:
        fast = np.asarray(model.apply(params, batch, max_len=T,
                                      fast_argmax=True,
                                      method=type(model).predict)["answer"])
    finally:
        ca._FORCE_INTERPRET = False
    agreement = (slow == fast).mean()
    assert agreement >= 0.99, (agreement, slow, fast)

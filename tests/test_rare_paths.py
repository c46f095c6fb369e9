"""Coverage for less-traveled paths: beam over nested cache states, the
sampling loop, multi-rank shard merging, GLKS with multiple window sizes,
BERT-vocab-file preparation, and sample-weighted losses."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from case_rg_tpu.config import DataConfig, ModelConfig
from case_rg_tpu.models import create_model
from case_rg_tpu.models.predict import beam_predict, sample_predict
from case_rg_tpu.runtime.io import merge_shards, save_results

V = 40


def _tmemnet_batch(rng, b=3):
    resp = rng.randint(7, V, size=(b, 5)).astype(np.int32)
    resp[:, -1] = 3
    return {"context": jnp.asarray(rng.randint(4, V, (b, 8)), jnp.int32),
            "passage": jnp.asarray(rng.randint(4, V, (b, 3, 9)), jnp.int32),
            "passage_label": jnp.asarray(rng.randint(0, 3, b), jnp.int32),
            "response": jnp.asarray(resp)}


def test_tmemnet_beam_over_nested_cache_state():
    """Beam search must reindex TMemNet's nested decode state (per-layer KV
    caches + history + step counter)."""
    rng = np.random.RandomState(0)
    batch = _tmemnet_batch(rng)
    cfg = ModelConfig(name="tmemnet", vocab_size=V, embedding_size=16,
                      hidden_size=16, num_heads=2, tmemnet_layers=2,
                      max_dec_len=5)
    model = create_model("tmemnet", cfg)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)},
                        batch, method=type(model).train_losses)
    ids = beam_predict(model, params, batch, max_len=5, width=2)
    assert ids.shape == (3, 5)
    assert np.isfinite(np.asarray(ids)).all()


def test_sample_predict_runs_and_respects_eos():
    rng = np.random.RandomState(1)
    b = 4
    batch = {"context": jnp.asarray(rng.randint(4, V, (b, 6)), jnp.int32),
             "background": jnp.asarray(rng.randint(4, V, (b, 10)), jnp.int32),
             "response": jnp.asarray(rng.randint(7, V, (b, 5)), jnp.int32)}
    cfg = ModelConfig(name="s2sa", vocab_size=V, embedding_size=8,
                      hidden_size=8, num_heads=2, max_dec_len=5)
    model = create_model("s2sa", cfg)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)},
                        batch, method=type(model).train_losses)
    ids = np.asarray(sample_predict(model, params, batch, 5,
                                    jax.random.PRNGKey(7)))
    assert ids.shape == (b, 5)
    # final step forces EOS (or PAD if already ended) — Generations.py:50-53
    assert all(t in (0, 3) for t in ids[:, -1])


def test_merge_shards_multi_rank(tmp_path):
    from case_rg_tpu.constants import SPECIAL_WORDS
    from case_rg_tpu.data.vocab import Vocabulary
    words = list(SPECIAL_WORDS) + ["w"]
    vocab = Vocabulary({w: i for i, w in enumerate(words)},
                       {i: w for i, w in enumerate(words)})
    meta = [{"context_id": [], "query_id": f"q{i}", "passage_id": ["p"],
             "passage_pool_id": ["p"]} for i in range(4)]
    for rank, rows in ((0, [0, 2]), (1, [1, 3])):
        batch = {"id": np.array(rows), "_indices": np.array(rows),
                 "sample_weight": np.ones(2, np.float32)}
        out = {"answer": np.array([[7, 3], [7, 3]])}
        save_results([(batch, out)], meta, vocab, str(tmp_path), rank, 0, "ds_test")
    merged = merge_shards(str(tmp_path / "result"))
    lines = open(merged["ds_test_0"]["answer"]).read().strip("\n").split("\n")
    assert len(lines) == 4
    qids = sorted(l.split("\t")[1] for l in lines)
    assert qids == ["q0", "q1", "q2", "q3"]


def test_glks_multi_window_sizes():
    from case_rg_tpu.data.labels import glks_selection_label
    rng = np.random.RandomState(2)
    bg = rng.randint(1, 30, size=40)
    ans = bg[:6].copy()
    for native in (True, False):
        p = glks_selection_label(bg, ans, min_window_size=5, n_windows=4,
                                 use_native=native)
        n_w = sum((40 - 5 * k) // 5 + 1 for k in range(1, 5))
        assert p.shape == (n_w,)
        np.testing.assert_allclose(p.sum(), 1.0, atol=1e-5)

    cfg = ModelConfig(name="glks", vocab_size=V, embedding_size=8,
                      hidden_size=8, num_heads=2, max_dec_len=4,
                      min_window_size=5, num_windows=4)
    model = create_model("glks", cfg)
    b, lb = 2, 40
    n_w = sum((lb - 5 * k) // 5 + 1 for k in range(1, 5))
    sel = np.random.RandomState(3).rand(b, n_w).astype(np.float32)
    sel /= sel.sum(-1, keepdims=True)
    batch = {"context": jnp.asarray(np.full((b, 6), 7), jnp.int32),
             "background": jnp.asarray(np.full((b, lb), 8), jnp.int32),
             "response": jnp.asarray(np.full((b, 4), 9), jnp.int32),
             "selection": jnp.asarray(sel)}
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)},
                        batch, method=type(model).train_losses)
    losses = model.apply(params, batch, deterministic=True,
                         method=type(model).train_losses)
    assert np.isfinite(float(sum(losses.values())))


def test_prepare_with_bert_vocab_file(tmp_path):
    from case_rg_tpu.constants import SPECIAL_WORDS
    from case_rg_tpu.data.prepare import prepare_dataset, load_prepared
    from fixtures import make_dataset, WORDS
    root = str(tmp_path)
    make_dataset(root, "toy", n_queries=6, n_passages=20)
    vocab_path = os.path.join(root, "vocab.txt")
    with open(vocab_path, "w") as f:
        f.write("\n".join(list(SPECIAL_WORDS) + sorted(set(WORDS)) + ["?", "."])
                + "\n")
    cfg = DataConfig(dataset="toy", data_path=root, query_len=16,
                     passage_len=16, num_passage=3, answer_len=8,
                     vocab_file=vocab_path)
    out = prepare_dataset(root, "toy", cfg, verbose=False, models=["s2sa"])
    arrays, meta, vocab, _ = load_prepared(out, "train", "s2sa")
    assert vocab.vocab2id["[PAD]"] == 0
    assert len(arrays["id"]) == len(meta) > 0


def test_sample_weighted_loss_ignores_padded_rows():
    from case_rg_tpu.models.base import bce_with_logits, nll_from_probs
    rng = np.random.RandomState(4)
    logits = jnp.asarray(rng.randn(4, 5), jnp.float32)
    labels = jnp.asarray((rng.rand(4, 5) > 0.5).astype(np.float32))
    w_full = jnp.ones(4)
    w_half = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    half = bce_with_logits(logits[:2], labels[:2], None)
    weighted = bce_with_logits(logits, labels, w_half)
    np.testing.assert_allclose(float(weighted), float(half), rtol=1e-6)

    probs = jnp.asarray(rng.rand(4, 6), jnp.float32)
    tgts = jnp.asarray(rng.randint(0, 2, (4, 6)) * 3, jnp.int32)  # some PAD
    np.testing.assert_allclose(
        float(nll_from_probs(probs, tgts, w_half)),
        float(nll_from_probs(probs[:2], tgts[:2], None)), rtol=1e-6)

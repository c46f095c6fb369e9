"""Sampling decode through the inference dispatch + orbax checkpoint backend.

Sampling for the protocol models reproduces common/Generations.py sample:7-63
(via decode/loops.run_sample); sampling for the CaSE/Masque multi-memory
decoders is a capability beyond the reference (which only decodes them
greedily). The orbax backend is the async/sharded alternative to the default
msgpack files (train/checkpoint.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from case_rg_tpu.config import ModelConfig, TrainConfig
from case_rg_tpu.models import create_model
from case_rg_tpu.runtime.inference import make_predict_fn
from case_rg_tpu.train.checkpoint import (checkpoint_exists, latest_epoch,
                                          load_checkpoint, save_checkpoint,
                                          wait_for_checkpoints)
from case_rg_tpu.train.trainer import Trainer

V, E = 40, 16
B, LQ, P, LP, T = 3, 8, 4, 10, 6


def _cfg(name):
    return ModelConfig(name=name, vocab_size=V, embedding_size=E,
                       hidden_size=E, num_heads=2, enc_layers=2, dec_layers=2,
                       max_dec_len=T)


def _ids(rng, shape, pad_tail=0):
    ids = rng.randint(4, V, size=shape).astype(np.int32)
    if pad_tail:
        ids[..., -pad_tail:] = 0
    return ids


def _s2sa_batch(rng):
    resp = _ids(rng, (B, T))
    resp[:, -1] = 3
    return {"context": jnp.array(_ids(rng, (B, LQ), pad_tail=2)),
            "background": jnp.array(_ids(rng, (B, P * LP), pad_tail=5)),
            "response": jnp.array(resp),
            "sample_weight": jnp.ones(B, np.float32)}


def _case_batch(rng):
    resp = _ids(rng, (B, T))
    resp[:, -1] = 3
    passage = _ids(rng, (B, P, LP), pad_tail=3)
    lab = (passage != 0).astype(np.float32) * (rng.rand(B, P, LP) > 0.5)
    return {"query": jnp.array(_ids(rng, (B, 1, LQ), pad_tail=2)),
            "passage": jnp.array(passage),
            "passage_label": jnp.array(rng.randint(0, P, B).astype(np.int32)),
            "response": jnp.array(resp),
            "token_label": jnp.array(lab.astype(np.float32)),
            "token_weight": jnp.array(np.where(lab > 0, 1.5, 1.0)
                                      .astype(np.float32)),
            "sample_weight": jnp.ones(B, np.float32)}


def _init(model, batch):
    return model.init({"params": jax.random.PRNGKey(0),
                       "dropout": jax.random.PRNGKey(1)},
                      batch, method=type(model).train_losses)


@pytest.mark.parametrize("name,make_batch",
                         [("s2sa", _s2sa_batch), ("case", _case_batch)])
def test_sampling_dispatch(name, make_batch):
    rng = np.random.RandomState(0)
    batch = make_batch(rng)
    cfg = _cfg(name)
    model = create_model(name, cfg)
    variables = _init(model, batch)

    fn = make_predict_fn(model, cfg, T, decoding="sample", sample_seed=7)
    out1 = jax.device_get(fn(variables, batch))
    ids = out1["answer"]
    assert ids.shape == (B, T)
    assert ids.min() >= 0 and ids.max() < V
    # every row terminates: the final emitted token is EOS or PAD
    # (run_sample / MultiMemoryDecoder.sample force EOS at the last step)
    assert np.isin(ids[:, -1], [0, 3]).all()
    if name == "case":
        assert out1["rank"].shape == (B, P)

    # the rng stream advances per call ...
    out2 = jax.device_get(fn(variables, batch))
    # ... and is reproducible from the seed
    fn_replay = make_predict_fn(model, cfg, T, decoding="sample",
                                sample_seed=7)
    replay1 = jax.device_get(fn_replay(variables, batch))
    replay2 = jax.device_get(fn_replay(variables, batch))
    np.testing.assert_array_equal(ids, replay1["answer"])
    np.testing.assert_array_equal(out2["answer"], replay2["answer"])

    other = jax.device_get(make_predict_fn(model, cfg, T, decoding="sample",
                                           sample_seed=8)(variables, batch))
    assert not np.array_equal(ids, other["answer"])


def test_sampling_tmemnet_includes_rank():
    rng = np.random.RandomState(1)
    resp = _ids(rng, (B, T))
    resp[:, -1] = 3
    batch = {"context": jnp.array(_ids(rng, (B, LQ), pad_tail=2)),
             "passage": jnp.array(_ids(rng, (B, P, LP), pad_tail=3)),
             "passage_label": jnp.array(rng.randint(0, P, B).astype(np.int32)),
             "response": jnp.array(resp),
             "sample_weight": jnp.ones(B, np.float32)}
    cfg = ModelConfig(name="tmemnet", vocab_size=V, embedding_size=E,
                      hidden_size=E, num_heads=2, tmemnet_layers=2,
                      max_dec_len=T)
    model = create_model("tmemnet", cfg)
    variables = _init(model, batch)
    out = jax.device_get(make_predict_fn(model, cfg, T, decoding="sample")(
        variables, batch))
    assert out["answer"].shape == (B, T)
    assert out["rank"].shape == (B, P)


def _train_state(tmp_path):
    rng = np.random.RandomState(2)
    batch = {k: np.asarray(v) for k, v in _s2sa_batch(rng).items()}
    model = create_model("s2sa", _cfg("s2sa"))
    tc = TrainConfig(batch_size=B, learning_rate=1e-3, warmup_steps=1,
                     accumulation_steps=2)   # MultiSteps state in the tree
    trainer = Trainer(model, tc, total_steps=50)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    state, _ = trainer.train_step(state, dict(batch), jax.random.PRNGKey(3))
    return trainer, state, batch


def test_orbax_checkpoint_roundtrip(tmp_path):
    out = str(tmp_path)
    trainer, state, batch = _train_state(tmp_path)
    host = jax.device_get(state)
    save_checkpoint(out, 0, host, backend="orbax")
    wait_for_checkpoints()
    assert checkpoint_exists(out, 0)
    assert latest_epoch(out) == 0

    template = jax.tree_util.tree_map(np.zeros_like, host)
    restored = load_checkpoint(out, 0, template)
    for a, b in zip(jax.tree_util.tree_leaves(host),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # overwrite-in-place (salvage checkpoints reuse one path)
    state2, _ = trainer.train_step(state, dict(batch), jax.random.PRNGKey(4))
    host2 = jax.device_get(state2)
    save_checkpoint(out, 0, host2, backend="orbax")
    wait_for_checkpoints()
    re2 = load_checkpoint(out, 0, template)
    np.testing.assert_array_equal(np.asarray(re2.step), np.asarray(host2.step))


def test_checkpoint_backend_autodetect(tmp_path):
    out = str(tmp_path)
    _, state, _ = _train_state(tmp_path)
    host = jax.device_get(state)
    save_checkpoint(out, 0, host, backend="msgpack")
    save_checkpoint(out, 1, host, backend="orbax")
    wait_for_checkpoints()
    assert latest_epoch(out) == 1
    template = jax.tree_util.tree_map(np.zeros_like, host)
    for epoch in (0, 1):
        assert checkpoint_exists(out, epoch)
        restored = load_checkpoint(out, epoch, template)
        np.testing.assert_array_equal(np.asarray(restored.step),
                                      np.asarray(host.step))


def test_sampling_controls():
    """decode/loops.sampling_controls: identity defaults, temperature,
    top-k mask, nucleus mass (always keeps the argmax)."""
    import jax.numpy as jnp
    from case_rg_tpu.decode.loops import sampling_controls

    logits = jnp.asarray([[0.0, 1.0, 2.0, 3.0],
                          [3.0, 2.0, 1.0, 0.0]], jnp.float32)
    np.testing.assert_array_equal(np.asarray(sampling_controls(logits)),
                                  np.asarray(logits))
    np.testing.assert_allclose(
        np.asarray(sampling_controls(logits, temperature=2.0)),
        np.asarray(logits) / 2.0)
    out = np.asarray(sampling_controls(logits, top_k=2))
    assert (out[0, :2] < -1e29).all() and (out[0, 2:] > -1).all()
    assert (out[1, 2:] < -1e29).all() and (out[1, :2] > -1).all()
    out = np.asarray(sampling_controls(logits, top_p=0.1))
    assert (out[0] > -1e29).sum() == 1 and out[0, 3] > -1e29
    assert (out[1] > -1e29).sum() == 1 and out[1, 0] > -1e29
    # softmax([0..3]) cum mass before the last token is ~0.356 < 0.999:
    # everything stays
    out = np.asarray(sampling_controls(logits, top_p=0.999))
    assert (out[0] > -1e29).sum() == 4
    # combined: temperature + top_k compose
    out = np.asarray(sampling_controls(logits, temperature=0.5, top_k=1))
    assert (out[0] > -1e29).sum() == 1 and abs(out[0, 3] - 6.0) < 1e-5
    # degenerate values are rejected (not silently uniform/NaN)
    for bad in (dict(temperature=0.0), dict(temperature=-1.0),
                dict(top_p=0.0), dict(top_p=1.5), dict(top_k=-1)):
        with pytest.raises(ValueError):
            sampling_controls(logits, **bad)


def test_rank_only_predict():
    """make_predict_fn(rank_only=True): returns exactly the same pool
    scores as the full predict path (whose decode it skips), for every
    model with a rank head; models without one are rejected."""
    rng = np.random.RandomState(3)

    # case
    batch = _case_batch(rng)
    cfg = _cfg("case")
    model = create_model("case", cfg)
    variables = _init(model, batch)
    full = jax.device_get(make_predict_fn(model, cfg, T)(variables, batch))
    ro = jax.device_get(
        make_predict_fn(model, cfg, T, rank_only=True)(variables, batch))
    assert set(ro) == {"rank"}
    np.testing.assert_allclose(ro["rank"], full["rank"], rtol=1e-6)

    # masque (no token labels)
    mb = {k: v for k, v in _case_batch(rng).items()
          if k not in ("token_label", "token_weight")}
    mcfg = _cfg("masque")
    mmodel = create_model("masque", mcfg)
    mvars = _init(mmodel, mb)
    full = jax.device_get(make_predict_fn(mmodel, mcfg, T)(mvars, mb))
    ro = jax.device_get(
        make_predict_fn(mmodel, mcfg, T, rank_only=True)(mvars, mb))
    np.testing.assert_allclose(ro["rank"], full["rank"], rtol=1e-6)

    # tmemnet (rank = knowledge attention from encode)
    resp = _ids(rng, (B, T))
    resp[:, -1] = 3
    tb = {"context": jnp.array(_ids(rng, (B, LQ), pad_tail=2)),
          "passage": jnp.array(_ids(rng, (B, P, LP), pad_tail=3)),
          "passage_label": jnp.array(rng.randint(0, P, B).astype(np.int32)),
          "response": jnp.array(resp),
          "sample_weight": jnp.ones(B, np.float32)}
    tcfg = ModelConfig(name="tmemnet", vocab_size=V, embedding_size=E,
                       hidden_size=E, num_heads=2, tmemnet_layers=2,
                       max_dec_len=T)
    tmodel = create_model("tmemnet", tcfg)
    tvars = _init(tmodel, tb)
    full = jax.device_get(make_predict_fn(tmodel, tcfg, T)(tvars, tb))
    ro = jax.device_get(
        make_predict_fn(tmodel, tcfg, T, rank_only=True)(tvars, tb))
    np.testing.assert_allclose(ro["rank"], full["rank"], rtol=1e-6)

    # no rank head -> explicit error
    scfg = _cfg("s2sa")
    with pytest.raises(ValueError):
        make_predict_fn(create_model("s2sa", scfg), scfg, T, rank_only=True)


def test_restore_with_eval_shape_template(tmp_path):
    """Checkpoint restore accepts a compute-free jax.eval_shape template
    (what cli/serve.ensure_params builds instead of running the full init
    on device) — both msgpack and orbax backends."""
    import jax
    import jax.numpy as jnp
    from case_rg_tpu.config import ModelConfig, TrainConfig
    from case_rg_tpu.models import create_model
    from case_rg_tpu.train.trainer import Trainer
    from case_rg_tpu.train.checkpoint import (load_checkpoint,
                                              save_checkpoint,
                                              wait_for_checkpoints)

    cfg = ModelConfig(name="s2sa", vocab_size=64, embedding_size=8,
                      hidden_size=8, num_heads=2, max_dec_len=4)
    model = create_model("s2sa", cfg)
    rng = np.random.RandomState(0)
    batch = {"context": jnp.asarray(rng.randint(4, 64, (2, 6)), jnp.int32),
             "background": jnp.asarray(rng.randint(4, 64, (2, 8)), jnp.int32),
             "response": jnp.asarray(rng.randint(4, 64, (2, 4)), jnp.int32),
             "sample_weight": jnp.ones((2,), jnp.float32)}
    tr = Trainer(model, TrainConfig(batch_size=2, output_path=str(tmp_path)),
                 total_steps=4)
    state = tr.init_state(jax.random.PRNGKey(0), batch)
    host = jax.device_get(state)
    tmpl = jax.eval_shape(lambda: tr.init_state(jax.random.PRNGKey(0), batch))

    for backend in ("msgpack", "orbax"):
        out = str(tmp_path / backend)
        save_checkpoint(out, 0, host, backend=backend)
        wait_for_checkpoints()
        restored = load_checkpoint(out, 0, tmpl)
        a = jax.tree_util.tree_leaves(restored.params)
        b = jax.tree_util.tree_leaves(host.params)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_serve_chunking_helpers(tmp_path):
    """cli/serve streaming helpers: chunk framing and padded batches."""
    import io
    from case_rg_tpu.cli.serve import _read_chunks, _chunk_to_batch
    from case_rg_tpu.config import DataConfig
    from case_rg_tpu.data.vocab import Vocabulary

    lines = "\n".join(['{"id": "r%d", "query": "a b", "passages": ["c d"]}'
                       % i for i in range(5)] + ["", "  "])
    chunks = list(_read_chunks(io.StringIO(lines), 2))
    assert [len(c) for c in chunks] == [2, 2, 1]
    assert chunks[2][0]["id"] == "r4"

    vocab = Vocabulary.build_from_texts([["a", "b", "c", "d"]])
    dcfg = DataConfig(query_len=8, passage_len=8, num_passage=2,
                      answer_len=4)
    from case_rg_tpu.cli.serve import _bucket_for, _parse_buckets
    assert _bucket_for(0, [2, 5, 10]) == 2
    assert _bucket_for(2, [2, 5, 10]) == 2
    assert _bucket_for(3, [2, 5, 10]) == 5
    assert _bucket_for(10, [2, 5, 10]) == 10
    assert _bucket_for(17, [2, 5, 10]) == 10   # truncated to the largest
    # num_passage always joins as the largest bucket
    assert _parse_buckets("2,5", 10) == [2, 5, 10]
    assert _parse_buckets("2,10", 10) == [2, 10]
    import pytest as _pytest
    with _pytest.raises(SystemExit):
        _parse_buckets("0,4", 10)

    batch = _chunk_to_batch(chunks[2], "case", vocab, dcfg, bs=4)
    assert batch["query"].shape == (4, 1, 8)
    assert batch["passage"].shape == (4, 2, 8)
    assert batch["sample_weight"].tolist() == [1.0, 0.0, 0.0, 0.0]
    assert batch["passage_label"].shape == (4,)
    # pad rows duplicate the last real request
    assert (batch["query"][1] == batch["query"][0]).all()

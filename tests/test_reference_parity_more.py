"""Whole-model reference parity for Masque, TMemNet, S2SA, GTTP, GLKS.

Same methodology as test_reference_parity.py: convert the reference torch
module weights into our Flax trees, then require matching losses and decodes.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax
import jax.numpy as jnp

from case_rg_tpu.config import ModelConfig
from case_rg_tpu.models import create_model
from case_rg_tpu.models.predict import greedy_predict
from reference_loader import REFERENCE_PATH, load_reference, make_vocab
from test_reference_parity import (_bilinear, _multimem_decoder, _no_dropout,
                                   _seq_encoder, _tower)
from torch_helpers import gru_params, layernorm_params, linear_params, \
    mha_params, t2n

pytestmark = pytest.mark.skipif(
    not os.path.exists(REFERENCE_PATH), reason="reference not mounted")

V, D, B, LQ, P, LP, T = 64, 32, 2, 10, 3, 12, 6


def _ids(rng, shape, pad_tail=0, lo=7):
    x = rng.randint(lo, V, size=shape).astype(np.int64)
    if pad_tail:
        x[..., -pad_tail:] = 0
    return x


def _resp(rng):
    r = rng.randint(7, V, size=(B, T)).astype(np.int64)
    r[:, -1] = 3
    r[0, -2:] = 0
    r[0, -3] = 3
    return r


# ---------------- Masque ----------------

def test_masque_parity():
    load_reference()
    torch.manual_seed(11)
    from Masque.Model import Masque as RefMasque
    vocab2id, id2vocab = make_vocab(V)
    ref = RefMasque(T, id2vocab, vocab2id, D)
    ref.eval()

    cfg = ModelConfig(name="masque", vocab_size=V, embedding_size=D,
                      hidden_size=D, num_heads=8, enc_layers=3, dec_layers=4,
                      max_dec_len=T, max_target_length=T)
    model = create_model("masque", cfg)
    params = {
        "encoder": _seq_encoder(ref.query_encoder, 3),
        "tower": _tower(ref.passage_selection, 3, 5),
        "scorer": linear_params(ref.passage_selection.scorer),
        "decoder": _multimem_decoder(ref.response_generation.decoder, 2, 4,
                                     use_feature=False),
    }
    variables = {"params": params}

    rng = np.random.RandomState(0)
    query = _ids(rng, (B, 1, LQ), pad_tail=2)
    passage = _ids(rng, (B, P, LP), pad_tail=3)
    resp = _resp(rng)
    label = rng.randint(0, P, size=(B,)).astype(np.int64)
    src = np.concatenate([query[:, 0], passage.reshape(B, -1)], axis=1)

    data = {"query": torch.tensor(query), "passage": torch.tensor(passage),
            "response": torch.tensor(resp),
            "passage_label": torch.tensor(label),
            "source_map": torch.tensor(src)}
    ref.train()
    with torch.no_grad(), _no_dropout():
        ref_losses = [float(l) for l in ref(dict(data), method="train")]
    ref.eval()

    batch = {"query": jnp.asarray(query.astype(np.int32)),
             "passage": jnp.asarray(passage.astype(np.int32)),
             "response": jnp.asarray(resp.astype(np.int32)),
             "passage_label": jnp.asarray(label.astype(np.int32))}
    ours = model.apply(variables, batch, deterministic=True,
                       method=type(model).train_losses)
    np.testing.assert_allclose([float(ours["select"]), float(ours["gen"])],
                               ref_losses, rtol=2e-4, atol=2e-5)

    with torch.no_grad():
        ref_out = ref({"query": torch.tensor(query),
                       "passage": torch.tensor(passage),
                       "source_map": torch.tensor(src)}, method="test")
    pred = model.apply(variables, {"query": batch["query"],
                                   "passage": batch["passage"]},
                       max_len=T, method=type(model).predict)
    np.testing.assert_allclose(np.asarray(pred["rank"]),
                               ref_out["rank"].numpy(), rtol=2e-4, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(pred["answer"]),
                                  ref_out["answer"].numpy())


# ---------------- TMemNet ----------------

def test_tmemnet_parity():
    load_reference()
    torch.manual_seed(12)
    from TMemNet.Model import TMemNet as RefTMemNet
    vocab2id, id2vocab = make_vocab(V)
    ref = RefTMemNet(D, D, vocab2id, id2vocab, max_dec_len=T)
    ref.eval()

    cfg = ModelConfig(name="tmemnet", vocab_size=V, embedding_size=D,
                      hidden_size=D, num_heads=8, tmemnet_layers=8,
                      max_dec_len=T)
    model = create_model("tmemnet", cfg)

    def _stack(tf, n):
        return {f"layer{i}": {
            "self_attn": mha_params(tf.layers[i].self_attn),
            "norm1": layernorm_params(tf.layers[i].norm1),
            "norm2": layernorm_params(tf.layers[i].norm2),
            "ffn": {"linear1": linear_params(tf.layers[i].linear1),
                    "linear2": linear_params(tf.layers[i].linear2)},
        } for i in range(n)}

    def _dec_stack(tf, n):
        return {f"layer{i}": {
            "self_attn": mha_params(tf.layers[i].self_attn),
            "cross_attn": mha_params(tf.layers[i].multihead_attn),
            "norm1": layernorm_params(tf.layers[i].norm1),
            "norm2": layernorm_params(tf.layers[i].norm2),
            "norm3": layernorm_params(tf.layers[i].norm3),
            "ffn": {"linear1": linear_params(tf.layers[i].linear1),
                    "linear2": linear_params(tf.layers[i].linear2)},
        } for i in range(n)}

    params = {
        "enc_embedding": {"embedding": t2n(ref.enc.embedding.weight)},
        "encoder": _stack(ref.enc.transformer, 8),
        "dec_embedding": {"embedding": t2n(ref.dec.embedding.weight)},
        "decoder": _dec_stack(ref.dec.transformer, 8),
        "gen": linear_params(ref.gen),
    }
    variables = {"params": params}

    rng = np.random.RandomState(1)
    context = _ids(rng, (B, LQ), pad_tail=2)
    passage = _ids(rng, (B, P, LP), pad_tail=4)
    resp = _resp(rng)
    label = rng.randint(0, P, size=(B,)).astype(np.int64)

    data = {"context": torch.tensor(context), "passage": torch.tensor(passage),
            "response": torch.tensor(resp), "label": torch.tensor(label)}
    ref.train()
    with torch.no_grad(), _no_dropout():
        ref_losses = [float(l) for l in ref(dict(data), method="train")]
    ref.eval()

    batch = {"context": jnp.asarray(context.astype(np.int32)),
             "passage": jnp.asarray(passage.astype(np.int32)),
             "response": jnp.asarray(resp.astype(np.int32)),
             "passage_label": jnp.asarray(label.astype(np.int32))}
    ours = model.apply(variables, batch, deterministic=True,
                       method=type(model).train_losses)
    np.testing.assert_allclose([float(ours["select"]), float(ours["gen"])],
                               ref_losses, rtol=2e-4, atol=2e-5)

    # rank parity (eval-mode argmax selection)
    with torch.no_grad():
        ref_rank = ref.encode({"context": torch.tensor(context),
                               "passage": torch.tensor(passage),
                               "label": None})["passage_selection"].numpy()
    our_rank = model.apply(variables, batch, method=type(model).rank)
    np.testing.assert_allclose(np.asarray(our_rank), ref_rank,
                               rtol=2e-4, atol=2e-5)

    # decode parity: drive the reference's step decode manually (its greedy
    # wrapper is broken — SURVEY §4) with the same EOS bookkeeping as
    # common/Generations.py:87-107, and compare to our cached greedy.
    with torch.no_grad():
        enc = ref.encode({"context": torch.tensor(context),
                          "passage": torch.tensor(passage), "label": None})
        prev = torch.full((B,), 1, dtype=torch.long)
        state = {"state": {}}
        ended = torch.zeros(B, dtype=torch.bool)
        outs = []
        dec_state = {}
        for t in range(T):
            dec_state = ref.decode(data, prev, enc,
                                   dec_state if t else {"state": {}}, t)
            logits = ref.generate(data, enc, dec_state)
            ids = logits.argmax(-1)
            this_end = ids == 3
            if t == 0:
                ids = torch.where(this_end, torch.full_like(ids, 2), ids)
            else:
                ids = torch.where(ended, torch.zeros_like(ids), ids)
            ended = ended | this_end
            outs.append(ids.clone())
            prev = ids
        ref_ids = torch.stack(outs, 1).numpy()

    our_ids = np.asarray(greedy_predict(model, variables, batch, max_len=T))
    np.testing.assert_array_equal(our_ids, ref_ids)

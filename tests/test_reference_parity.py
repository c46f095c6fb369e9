"""Whole-model numerical parity against the actual reference implementation.

The reference code under /root/reference is imported read-only (deps
stubbed), its randomly-initialized weights are converted into our Flax param
trees, and both implementations must produce (numerically) identical training
losses and identical greedy decodes / rank scores at eval. This is the
strongest correctness evidence available: it covers every layer-ordering,
masking, renormalization and mix-gate detail end to end.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax
import jax.numpy as jnp

from case_rg_tpu.config import ModelConfig
from case_rg_tpu.models import create_model
from reference_loader import REFERENCE_PATH, load_reference, make_vocab
from torch_helpers import layernorm_params, linear_params, mha_params, t2n

pytestmark = pytest.mark.skipif(
    not os.path.exists(REFERENCE_PATH), reason="reference not mounted")

V, D, B, LQ, P, LP, T = 64, 32, 2, 10, 3, 12, 6


def _enc_layer(ref, prefix):
    sd = dict(ref.named_modules())
    layer = sd[prefix]
    return {
        "self_attn": mha_params(layer.self_attn),
        "norm1": layernorm_params(layer.norm1),
        "norm2": layernorm_params(layer.norm2),
        "ffn": {"linear1": linear_params(layer.linear1),
                "linear2": linear_params(layer.linear2)},
    }


def _dec_layer(layer):
    return {
        "self_attn": mha_params(layer.self_attn),
        "cross_attn": mha_params(layer.multihead_attn),
        "norm1": layernorm_params(layer.norm1),
        "norm2": layernorm_params(layer.norm2),
        "norm3": layernorm_params(layer.norm3),
        "ffn": {"linear1": linear_params(layer.linear1),
                "linear2": linear_params(layer.linear2)},
    }


def _block(blk):
    return {
        "self_attn": mha_params(blk.self_attn),
        "norm1": layernorm_params(blk.norm1),
        "norm2": layernorm_params(blk.norm2),
        "linear1": linear_params(blk.linear1),
        "linear2": linear_params(blk.linear2),
    }


def _tower(tower, n_q, n_p):
    out = {"interaction": {
        "dual_att_kernel": t2n(tower.interaction.dual_att_linear.weight).T}}
    for i in range(n_q):
        out[f"q_block{i}"] = _block(tower.query_blocks[i])
    for i in range(n_p):
        out[f"p_block{i}"] = _block(tower.passage_blocks[i])
    return out


def _seq_encoder(enc, n_layers):
    out = {"embedding": {"embedding": t2n(enc.embedding[0].weight)}}
    out["enc"] = {f"layer{i}": {
        "self_attn": mha_params(enc.enc.layers[i].self_attn),
        "norm1": layernorm_params(enc.enc.layers[i].norm1),
        "norm2": layernorm_params(enc.enc.layers[i].norm2),
        "ffn": {"linear1": linear_params(enc.enc.layers[i].linear1),
                "linear2": linear_params(enc.enc.layers[i].linear2)},
    } for i in range(n_layers)}
    return out


def _bilinear(attn):
    return {"linear_key": linear_params(attn.linear_key),
            "linear_query": linear_params(attn.linear_query),
            "v": linear_params(attn.v)}


def _multimem_decoder(dec, n_mem, n_layers, use_feature):
    out = {"embedding": {"embedding": t2n(dec.embedding[0].weight)}}
    for m in range(n_mem):
        out[f"dec{m}"] = {f"layer{i}": _dec_layer(dec.decs[m].layers[i])
                          for i in range(n_layers)}
        out[f"attn{m}"] = _bilinear(dec.attns[m])
    out["norm1"] = layernorm_params(dec.norm1 if use_feature else dec.norm)
    if use_feature:
        out["norm2"] = layernorm_params(dec.norm2)
    gen_linears = [m for m in dec.gen if isinstance(m, torch.nn.Linear)]
    out["gen1"] = linear_params(gen_linears[0])
    out["gen2"] = linear_params(gen_linears[1])
    out["mix"] = linear_params(dec.mix)
    return out


@pytest.fixture(scope="module")
def case_pair():
    load_reference()
    torch.manual_seed(7)
    from CaSE.Model import CaSE as RefCaSE
    vocab2id, id2vocab = make_vocab(V)
    ref = RefCaSE(4, T, id2vocab, vocab2id, D)
    ref.eval()

    cfg = ModelConfig(name="case", vocab_size=V, embedding_size=D,
                      hidden_size=D, num_heads=8, enc_layers=3, dec_layers=4,
                      max_dec_len=T, max_target_length=T)
    model = create_model("case", cfg)

    params = {
        "encoder": _seq_encoder(ref.query_encoder, 3),
        "ps_tower": _tower(ref.passage_selection, 3, 5),
        "ps_scorer": linear_params(ref.passage_selection.scorer),
        "sti_tower": _tower(ref.span_extraction, 2, 3),
        "sti_scorer": linear_params(ref.span_extraction.scorer),
        "sti_norm_q": layernorm_params(ref.span_extraction.norm1),
        "sti_norm_p": layernorm_params(ref.span_extraction.norm2),
        "decoder": _multimem_decoder(ref.response_generation.decoder, 2, 4,
                                     use_feature=True),
    }
    return ref, model, {"params": params}


def _case_batch(rng):
    query = rng.randint(4, V, size=(B, 1, LQ)).astype(np.int64)
    query[:, :, -2:] = 0
    passage = rng.randint(4, V, size=(B, P, LP)).astype(np.int64)
    passage[:, :, -3:] = 0
    resp = rng.randint(7, V, size=(B, T)).astype(np.int64)
    resp[:, -1] = 3  # EOS
    resp[0, -2:] = 0  # a shorter target (PAD tail)
    resp[0, -3] = 3
    label = rng.randint(0, P, size=(B,)).astype(np.int64)
    tok_label = ((rng.rand(B, P, LP) > 0.6) & (passage != 0)).astype(np.float32)
    tok_weight = np.where(tok_label > 0, 1.3, 1.0).astype(np.float32)
    src = np.concatenate([query[:, 0], passage.reshape(B, -1)], axis=1)
    return query, passage, resp, label, tok_label, tok_weight, src


class _no_dropout:
    """Run the reference in train() mode (its do_train branches on
    self.training) with every F.dropout call neutralized, so losses are
    deterministic and comparable to our deterministic=True pass."""

    def __enter__(self):
        import torch.nn.functional as F
        self._orig = F.dropout
        F.dropout = lambda x, *a, **k: x
        return self

    def __exit__(self, *exc):
        import torch.nn.functional as F
        F.dropout = self._orig


def test_case_train_losses_match_reference(case_pair):
    ref, model, variables = case_pair
    rng = np.random.RandomState(0)
    query, passage, resp, label, tok_label, tok_weight, src = _case_batch(rng)

    data = {"query": torch.tensor(query), "passage": torch.tensor(passage),
            "response": torch.tensor(resp), "passage_label": torch.tensor(label),
            "token_label": torch.tensor(tok_label),
            "token_weight": torch.tensor(tok_weight),
            "source_map": torch.tensor(src)}
    ref.train()
    try:
        with torch.no_grad(), _no_dropout():
            ref_losses = [float(l) for l in ref(dict(data), method="train")]
    finally:
        ref.eval()

    batch = {"query": jnp.asarray(query.astype(np.int32)),
             "passage": jnp.asarray(passage.astype(np.int32)),
             "response": jnp.asarray(resp.astype(np.int32)),
             "passage_label": jnp.asarray(label.astype(np.int32)),
             "token_label": jnp.asarray(tok_label),
             "token_weight": jnp.asarray(tok_weight)}
    ours = model.apply(variables, batch, deterministic=True,
                       method=type(model).train_losses)
    got = [float(ours["select"]), float(ours["token"]), float(ours["gen"])]
    np.testing.assert_allclose(got, ref_losses, rtol=2e-4, atol=2e-5)


def test_case_predict_matches_reference(case_pair):
    ref, model, variables = case_pair
    rng = np.random.RandomState(1)
    query, passage, resp, label, tok_label, tok_weight, src = _case_batch(rng)

    data = {"query": torch.tensor(query), "passage": torch.tensor(passage),
            "source_map": torch.tensor(src)}
    with torch.no_grad():
        ref_out = ref(dict(data), method="test")

    batch = {"query": jnp.asarray(query.astype(np.int32)),
             "passage": jnp.asarray(passage.astype(np.int32))}
    ours = model.apply(variables, batch, max_len=T, method=type(model).predict)

    np.testing.assert_allclose(np.asarray(ours["rank"]),
                               ref_out["rank"].numpy(), rtol=2e-4, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(ours["answer"]),
                                  ref_out["answer"].numpy())

"""Whole-model reference parity for the GRU-based models (S2SA, GTTP, GLKS),
including parity with the reference's own greedy loop (common/Generations.py)."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax.numpy as jnp

from case_rg_tpu.config import ModelConfig
from case_rg_tpu.models import create_model
from case_rg_tpu.models.predict import greedy_predict
from reference_loader import REFERENCE_PATH, load_reference, make_vocab
from test_reference_parity import _bilinear, _no_dropout
from torch_helpers import gru_params, linear_params, t2n

pytestmark = pytest.mark.skipif(
    not os.path.exists(REFERENCE_PATH), reason="reference not mounted")

V, E, H, B, LC, LB, T = 64, 16, 20, 2, 10, 36, 6


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


def _bbc_params(ref):
    return {
        "encoders": {
            "embedding": {"embedding": t2n(ref.c_embedding.weight)},
            "c_enc": gru_params(ref.c_enc, 1, True),
            "b_enc": gru_params(ref.b_enc, 1, True),
            "enc2dec": linear_params(ref.enc2dec),
        },
        "dec": {
            "embedding": {"embedding": t2n(ref.dec.embedding.weight)},
            "src_attn": _bilinear(ref.dec.src_attn),
            "bg_attn": _bilinear(ref.dec.bg_attn),
            "gru": gru_params(ref.dec.gru, 1, False),
            "readout": linear_params(ref.dec.readout),
        },
    }


def _data(rng):
    context = _ids(rng, (B, LC), pad_tail=2)
    background = _ids(rng, (B, LB), pad_tail=5)
    resp = _resp(rng)
    return context, background, resp


def _run_parity(name, ref, variables, cfg, data_t, batch, losses_keys):
    model = create_model(name, cfg)
    ref.train()
    with torch.no_grad(), _no_dropout():
        ref_loss = ref(dict(data_t), method="train" if name != "glks"
                       else "ds_mle_mce_train")
        ref_loss = [float(l) for l in (ref_loss if isinstance(ref_loss, list)
                                       else [ref_loss])]
    ref.eval()
    kwargs = {"mode": "ds_mle_mce_train"} if name == "glks" else {}
    ours = model.apply(variables, batch, deterministic=True,
                       method=type(model).train_losses, **kwargs)
    got = [float(ours[k]) for k in losses_keys]
    np.testing.assert_allclose(got, ref_loss, rtol=3e-4, atol=3e-5)

    with torch.no_grad():
        ref_out = ref(dict(data_t), method="test")
    our_ids = np.asarray(greedy_predict(model, variables, batch, max_len=T))
    np.testing.assert_array_equal(our_ids, ref_out["answer"].numpy())


def test_s2sa_parity():
    load_reference()
    torch.manual_seed(21)
    from S2SA.Model import S2SA as RefS2SA
    vocab2id, id2vocab = make_vocab(V)
    ref = RefS2SA(E, H, vocab2id, id2vocab, max_dec_len=T, beam_width=1)
    ref.eval()
    params = _bbc_params(ref)
    params["gen"] = linear_params(ref.gen)
    cfg = ModelConfig(name="s2sa", vocab_size=V, embedding_size=E,
                      hidden_size=H, num_heads=2, max_dec_len=T)
    rng = np.random.RandomState(0)
    context, background, resp = _data(rng)
    data_t = {"id": torch.arange(B), "context": torch.tensor(context),
              "background": torch.tensor(background),
              "response": torch.tensor(resp)}
    batch = {"context": jnp.asarray(context.astype(np.int32)),
             "background": jnp.asarray(background.astype(np.int32)),
             "response": jnp.asarray(resp.astype(np.int32))}
    _run_parity("s2sa", ref, {"params": params}, cfg, data_t, batch, ["mle"])


def test_gttp_parity():
    load_reference()
    torch.manual_seed(22)
    from GTTP.Model import GTTP as RefGTTP
    vocab2id, id2vocab = make_vocab(V)
    ref = RefGTTP(E, H, vocab2id, id2vocab, max_dec_len=T, beam_width=1)
    ref.eval()
    params = _bbc_params(ref)
    params["gen_linear"] = linear_params(ref.gen.linear)
    params["copy_linear"] = linear_params(ref.gen.linear_copy)
    cfg = ModelConfig(name="gttp", vocab_size=V, embedding_size=E,
                      hidden_size=H, num_heads=2, max_dec_len=T)
    rng = np.random.RandomState(1)
    context, background, resp = _data(rng)
    data_t = {"id": torch.arange(B), "context": torch.tensor(context),
              "background": torch.tensor(background),
              "response": torch.tensor(resp),
              "background_map": torch.tensor(background)}
    batch = {"context": jnp.asarray(context.astype(np.int32)),
             "background": jnp.asarray(background.astype(np.int32)),
             "response": jnp.asarray(resp.astype(np.int32))}
    _run_parity("gttp", ref, {"params": params}, cfg, data_t, batch, ["mle"])


def _highway(hw, n):
    out = {}
    for i in range(n):
        out[f"gate{i}"] = linear_params(hw.gate[i])
        out[f"nonlinear{i}"] = linear_params(hw.nonlinear[i])
        out[f"linear{i}"] = linear_params(hw.linear[i])
    return out


def test_glks_parity():
    load_reference()
    torch.manual_seed(23)
    from GLKS.Model import GLKS as RefGLKS
    vocab2id, id2vocab = make_vocab(V)
    min_ws, n_win = 4, 1
    ref = RefGLKS(min_ws, n_win, E, H, vocab2id, id2vocab, max_dec_len=T,
                  beam_width=1)
    ref.eval()
    params = {
        "b_encoder": {"embedding0": {"embedding": t2n(ref.b_encoder.c_embedding[0].weight)},
                      "gru0": gru_params(ref.b_encoder.c_encs[0], 1, True)},
        "c_encoder": {"embedding0": {"embedding": t2n(ref.c_encoder.c_embedding[0].weight)},
                      "gru0": gru_params(ref.c_encoder.c_encs[0], 1, True)},
        "embedding": {"embedding": t2n(ref.embedding.weight)},
        "st_linear": linear_params(ref.state_tracker.linear),
        "st_gru": gru_params(ref.state_tracker.gru, 1, False),
        "k_selector": {
            "b_highway": _highway(ref.k_selector.b_highway, 2),
            "c_highway": _highway(ref.k_selector.c_highway, 2),
            "match_attn": _bilinear(ref.k_selector.match_attn),
            "area_attn": _bilinear(ref.k_selector.area_attn),
        },
        "copy_attn": _bilinear(ref.c_generator.b_attn),
        "vg_c_attn": _bilinear(ref.v_generator.c_attn),
        "vg_b_attn": _bilinear(ref.v_generator.b_attn),
        "vg_readout": linear_params(ref.v_generator.readout),
        "vg_generator": linear_params(ref.v_generator.generator),
        "mix_linear": linear_params(ref.mixture.linear1),
    }
    cfg = ModelConfig(name="glks", vocab_size=V, embedding_size=E,
                      hidden_size=H, num_heads=2, max_dec_len=T,
                      min_window_size=min_ws, num_windows=n_win)
    rng = np.random.RandomState(2)
    context, background, resp = _data(rng)
    n_w = (LB - min_ws) // min_ws + 1
    sel = rng.rand(B, n_w).astype(np.float32)
    sel /= sel.sum(-1, keepdims=True)
    data_t = {"id": torch.arange(B), "context": torch.tensor(context),
              "background": torch.tensor(background),
              "response": torch.tensor(resp),
              "background_map": torch.tensor(background),
              "selection": torch.tensor(sel)}
    batch = {"context": jnp.asarray(context.astype(np.int32)),
             "background": jnp.asarray(background.astype(np.int32)),
             "response": jnp.asarray(resp.astype(np.int32)),
             "selection": jnp.asarray(sel)}
    _run_parity("glks", ref, {"params": params}, cfg, data_t, batch,
                ["mle", "mce", "ds"])

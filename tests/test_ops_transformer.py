"""Encoder/decoder layer parity vs a torch composition of built-ins.

The torch side re-derives the reference's layer equations (norm -> attn ->
residual-on-normed-stream; see common/TransformerEncoder.py:55-77 and
common/TransformerDecoder.py:61-90) from torch primitives, then we require
our Flax layers to match. Also proves cached incremental decoding equals the
full-prefix recompute.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax
import jax.numpy as jnp

from case_rg_tpu.ops.transformer import Decoder, DecoderLayer, Encoder, EncoderLayer
from torch_helpers import layernorm_params, linear_params, mha_params


class TorchPreNormEncoderLayer(torch.nn.Module):
    """Torch rendering of the published encoder-layer equations."""

    def __init__(self, d, heads, d_ff):
        super().__init__()
        self.attn = torch.nn.MultiheadAttention(d, heads)
        self.lin1 = torch.nn.Linear(d, d_ff)
        self.lin2 = torch.nn.Linear(d_ff, d)
        self.n1 = torch.nn.LayerNorm(d)
        self.n2 = torch.nn.LayerNorm(d)

    def forward(self, x, pad_mask):  # x: [L, B, D]
        x = self.n1(x)
        x = x + self.attn(x, x, x, key_padding_mask=pad_mask)[0]
        x = self.n2(x)
        return x + self.lin2(torch.nn.functional.gelu(self.lin1(x)))


class TorchPreNormDecoderLayer(torch.nn.Module):
    def __init__(self, d, heads, d_ff):
        super().__init__()
        self.self_attn = torch.nn.MultiheadAttention(d, heads)
        self.cross_attn = torch.nn.MultiheadAttention(d, heads)
        self.lin1 = torch.nn.Linear(d, d_ff)
        self.lin2 = torch.nn.Linear(d_ff, d)
        self.n1 = torch.nn.LayerNorm(d)
        self.n2 = torch.nn.LayerNorm(d)
        self.n3 = torch.nn.LayerNorm(d)

    def forward(self, tgt, mem, causal, tgt_pad, mem_pad):
        tgt = self.n1(tgt)
        tgt = tgt + self.self_attn(tgt, tgt, tgt, attn_mask=causal,
                                   key_padding_mask=tgt_pad)[0]
        tgt = self.n2(tgt)
        tgt = tgt + self.cross_attn(tgt, mem, mem, key_padding_mask=mem_pad)[0]
        tgt = self.n3(tgt)
        return tgt + self.lin2(torch.nn.functional.gelu(self.lin1(tgt)))


def _enc_layer_params(tl):
    return {
        "norm1": layernorm_params(tl.n1), "norm2": layernorm_params(tl.n2),
        "self_attn": mha_params(tl.attn),
        "ffn": {"linear1": linear_params(tl.lin1), "linear2": linear_params(tl.lin2)},
    }


def _dec_layer_params(tl):
    return {
        "norm1": layernorm_params(tl.n1), "norm2": layernorm_params(tl.n2),
        "norm3": layernorm_params(tl.n3),
        "self_attn": mha_params(tl.self_attn),
        "cross_attn": mha_params(tl.cross_attn),
        "ffn": {"linear1": linear_params(tl.lin1), "linear2": linear_params(tl.lin2)},
    }


def test_encoder_layer_matches_torch():
    torch.manual_seed(0)
    d, heads, d_ff, b, l = 16, 4, 16, 3, 6
    tl = TorchPreNormEncoderLayer(d, heads, d_ff)
    rng = np.random.RandomState(0)
    x = rng.randn(b, l, d).astype(np.float32)
    keep = rng.rand(b, l) > 0.3
    keep[:, 0] = True
    with torch.no_grad():
        ref = tl(torch.tensor(x).transpose(0, 1), torch.tensor(~keep)).transpose(0, 1).numpy()
    layer = EncoderLayer(d_model=d, num_heads=heads, d_ff=d_ff, dropout=0.0)
    out = layer.apply({"params": _enc_layer_params(tl)}, jnp.array(x), jnp.array(keep))
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5)


def test_decoder_layer_matches_torch():
    torch.manual_seed(1)
    d, heads, d_ff, b, lt, lm = 16, 4, 16, 2, 5, 8
    tl = TorchPreNormDecoderLayer(d, heads, d_ff)
    rng = np.random.RandomState(1)
    tgt = rng.randn(b, lt, d).astype(np.float32)
    mem = rng.randn(b, lm, d).astype(np.float32)
    tgt_keep = rng.rand(b, lt) > 0.2
    tgt_keep[:, 0] = True
    mem_keep = rng.rand(b, lm) > 0.3
    mem_keep[:, 0] = True
    causal = torch.triu(torch.full((lt, lt), float("-inf")), diagonal=1)
    with torch.no_grad():
        ref = tl(torch.tensor(tgt).transpose(0, 1), torch.tensor(mem).transpose(0, 1),
                 causal, torch.tensor(~tgt_keep), torch.tensor(~mem_keep)
                 ).transpose(0, 1).numpy()
    layer = DecoderLayer(d_model=d, num_heads=heads, d_ff=d_ff, dropout=0.0)
    out = layer.apply({"params": _dec_layer_params(tl)}, jnp.array(tgt), jnp.array(mem),
                      jnp.array(tgt_keep), jnp.array(mem_keep))
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5)


def test_cached_decode_equals_full_recompute():
    """Incremental KV-cache decoding must reproduce the reference's
    recompute-the-prefix-each-step outputs (CaSE/Model.py:94-122) exactly."""
    d, heads, d_ff, layers, b, lt, lm = 16, 4, 32, 3, 2, 6, 7
    dec = Decoder(num_layers=layers, d_model=d, num_heads=heads, d_ff=d_ff, dropout=0.0)
    rng = np.random.RandomState(2)
    tgt = rng.randn(b, lt, d).astype(np.float32)
    mem = rng.randn(b, lm, d).astype(np.float32)
    tgt_keep = np.ones((b, lt), dtype=bool)
    tgt_keep[0, 4:] = False  # a "padded" generated token mid-stream
    mem_keep = rng.rand(b, lm) > 0.3
    mem_keep[:, 0] = True

    params = dec.init(jax.random.PRNGKey(0), jnp.array(tgt), jnp.array(mem))
    full = dec.apply(params, jnp.array(tgt), jnp.array(mem),
                     jnp.array(tgt_keep), jnp.array(mem_keep))

    cross = dec.apply(params, jnp.array(mem), method=Decoder.precompute_memory)
    cache = dec.init_cache(b, lt)
    outs = []
    for t in range(lt):
        hist = np.zeros((b, lt), dtype=bool)
        hist[:, :t + 1] = tgt_keep[:, :t + 1]
        y, cache = dec.apply(params, jnp.array(tgt[:, t:t + 1]), t, cache, cross,
                             jnp.array(hist), jnp.array(mem_keep),
                             method=Decoder.step)
        outs.append(np.asarray(y)[:, 0])
    np.testing.assert_allclose(np.stack(outs, 1), np.asarray(full), atol=1e-5)


def test_encoder_stack_runs_and_is_finite():
    d, heads = 8, 2
    enc = Encoder(num_layers=2, d_model=d, num_heads=heads, d_ff=8, dropout=0.1)
    x = jnp.array(np.random.RandomState(3).randn(2, 5, d).astype(np.float32))
    keep = jnp.ones((2, 5), dtype=bool)
    params = enc.init({"params": jax.random.PRNGKey(0)}, x, keep)
    out = enc.apply(params, x, keep, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(1)})
    assert np.isfinite(np.asarray(out)).all()

"""Golden-value tests for bilinear attention, interaction, highway, blocks,
positional embedding, copy machinery and mask helpers."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax
import jax.numpy as jnp

from case_rg_tpu.ops.bilinear import BilinearAttention
from case_rg_tpu.ops.blocks import TransformerBlock
from case_rg_tpu.ops.copynet import copy_prob_at, copy_scatter
from case_rg_tpu.ops.embedding import Embedding
from case_rg_tpu.ops.highway import Highway
from case_rg_tpu.ops.interaction import Interaction
from case_rg_tpu.ops.masking import masked_mean, masked_softmax
from case_rg_tpu.ops.positional import PositionalEmbedding, sinusoid_table
from torch_helpers import layernorm_params, linear_params, mha_params, t2n


def test_bilinear_attention_golden():
    """v . tanh(Wq + Uk) additive attention vs a direct numpy evaluation
    (ref math: common/BilinearAttention.py:24-46)."""
    rng = np.random.RandomState(0)
    b, lq, lk, dq, dk, h = 2, 3, 5, 6, 4, 8
    q = rng.randn(b, lq, dq).astype(np.float32)
    k = rng.randn(b, lk, dk).astype(np.float32)
    v = rng.randn(b, lk, dk).astype(np.float32)
    mask = rng.rand(b, lq, lk) > 0.3

    attn = BilinearAttention(query_size=dq, key_size=dk, hidden_size=h)
    params = attn.init(jax.random.PRNGKey(0), jnp.array(q), jnp.array(k), jnp.array(v))
    ctx, raw, norm = attn.apply(params, jnp.array(q), jnp.array(k), jnp.array(v),
                                mask=jnp.array(mask))

    p = params["params"]
    wq = q @ np.asarray(p["linear_query"]["kernel"]) + np.asarray(p["linear_query"]["bias"])
    uh = k @ np.asarray(p["linear_key"]["kernel"])
    scores = np.tanh(wq[:, :, None, :] + uh[:, None, :, :]) @ np.asarray(p["v"]["kernel"])
    scores = scores[..., 0]
    masked = np.where(mask, scores, -1e20)
    e = np.exp(masked - masked.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    probs = np.where(mask, probs, 0.0)
    np.testing.assert_allclose(np.asarray(norm), probs, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ctx), probs @ v, atol=1e-5)


def test_interaction_matches_dense_formulation():
    """The decomposed trilinear score must equal the reference's dense
    cat([Eq, Ep, Eq*Ep]) @ w formulation (common/Interaction.py:32-36),
    including second-order contexts and the max-pool for num_q=1."""
    rng = np.random.RandomState(1)
    b, np_, lq, lp, d = 2, 3, 4, 5, 6
    eq = rng.randn(b, 1, lq, d).astype(np.float32)
    ep = rng.randn(b, np_, lp, d).astype(np.float32)
    mq = rng.rand(b, 1, lq) > 0.2
    mp = rng.rand(b, np_, lp) > 0.2
    mq[..., 0] = True
    mp[..., 0] = True

    inter = Interaction(hidden_size=d)
    params = inter.init(jax.random.PRNGKey(0), jnp.array(eq), jnp.array(ep),
                        jnp.array(mq), jnp.array(mp))
    g_p_q, g_q_p = inter.apply(params, jnp.array(eq), jnp.array(ep),
                               jnp.array(mq), jnp.array(mp))

    w = np.asarray(params["params"]["dual_att_kernel"])[:, 0]
    # dense reference computation
    eqx = np.broadcast_to(eq, (b, np_, lq, d))
    u = np.zeros((b, np_, lp, lq), np.float32)
    for bi in range(b):
        for n in range(np_):
            for p_ in range(lp):
                for q_ in range(lq):
                    feat = np.concatenate([eqx[bi, n, q_], ep[bi, n, p_],
                                           eqx[bi, n, q_] * ep[bi, n, p_]])
                    u[bi, n, p_, q_] = feat @ w
    mqx = np.broadcast_to(mq, (b, np_, lq))
    pair = mp[..., :, None] & mqx[..., None, :]
    um = np.where(pair, u, -1e20)

    def soft(x, axis):
        e = np.exp(x - x.max(axis=axis, keepdims=True))
        s = e / e.sum(axis=axis, keepdims=True)
        return np.where(pair, s, 0.0)

    a_p = soft(um, 3)
    b_p = soft(um, 2)
    a1 = np.einsum("bnpq,bnqd->bnpd", a_p, eqx)
    b1 = np.einsum("bnpq,bnpd->bnqd", b_p, ep)
    a2 = np.einsum("bnpq,bnqd->bnpd", a_p, b1)
    b2 = np.einsum("bnpq,bnpd->bnqd", b_p, a1)
    ref_qp = np.concatenate([ep, a1, a2, ep * a1, ep * a2], -1) * mp[..., None]
    ref_pq = np.concatenate([eqx, b1, b2, eqx * b1, eqx * b2], -1) * mqx[..., None]
    ref_pq = ref_pq.max(axis=1, keepdims=True)
    np.testing.assert_allclose(np.asarray(g_q_p), ref_qp, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_p_q), ref_pq, atol=1e-5)


def test_highway_golden():
    rng = np.random.RandomState(2)
    x = rng.randn(3, 6).astype(np.float32)
    hw = Highway(input_size=6, output_size=6, num_layers=2)
    params = hw.init(jax.random.PRNGKey(1), jnp.array(x))
    out = hw.apply(params, jnp.array(x))
    p = params["params"]
    cur = x
    for i in range(2):
        g = 1 / (1 + np.exp(-(cur @ np.asarray(p[f"gate{i}"]["kernel"]) + np.asarray(p[f"gate{i}"]["bias"]))))
        n = np.tanh(cur @ np.asarray(p[f"nonlinear{i}"]["kernel"]) + np.asarray(p[f"nonlinear{i}"]["bias"]))
        l = cur @ np.asarray(p[f"linear{i}"]["kernel"]) + np.asarray(p[f"linear{i}"]["bias"])
        cur = g * n + (1 - g) * l
    np.testing.assert_allclose(np.asarray(out), cur, atol=1e-5)


class TorchBlock(torch.nn.Module):
    """Torch rendering of the 4-D block equations
    (ref: common/TransformerBlock.py:22-33): residual only around attention,
    FFN replaces the stream, padded positions zeroed."""

    def __init__(self, heads, din, dout):
        super().__init__()
        self.attn = torch.nn.MultiheadAttention(din, heads)
        self.n1 = torch.nn.LayerNorm(din)
        self.n2 = torch.nn.LayerNorm(din)
        self.l1 = torch.nn.Linear(din, dout)
        self.l2 = torch.nn.Linear(dout, dout)

    def forward(self, x, keep):
        b, n, l, d = x.shape
        h = x.reshape(-1, l, d)
        normed = self.n1(h).transpose(0, 1)
        a = self.attn(normed, normed, normed,
                      key_padding_mask=~keep.reshape(-1, l))[0].transpose(0, 1)
        h = h + a
        h = self.l2(torch.relu(self.l1(self.n2(h))))
        h = h.reshape(b, n, l, -1)
        return h.masked_fill(~keep.unsqueeze(-1), 0.0)


def test_transformer_block_matches_torch():
    torch.manual_seed(3)
    heads, din, dout, b, n, l = 2, 8, 4, 2, 3, 5
    tb = TorchBlock(heads, din, dout)
    rng = np.random.RandomState(3)
    x = rng.randn(b, n, l, din).astype(np.float32)
    keep = rng.rand(b, n, l) > 0.3
    keep[..., 0] = True
    with torch.no_grad():
        ref = tb(torch.tensor(x), torch.tensor(keep)).numpy()
    blk = TransformerBlock(num_heads=heads, input_size=din, output_size=dout, dropout=0.0)
    params = {"params": {
        "norm1": layernorm_params(tb.n1), "norm2": layernorm_params(tb.n2),
        "self_attn": mha_params(tb.attn),
        "linear1": linear_params(tb.l1), "linear2": linear_params(tb.l2),
    }}
    out = blk.apply(params, jnp.array(x), jnp.array(keep))
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5)


def test_positional_embedding_matches_torch_table():
    """Table must match the reference's sin/cos construction
    (common/PositionalEmbedding.py:27-31)."""
    d, max_len = 10, 50
    table = sinusoid_table(max_len, d)
    pos = torch.arange(0, max_len, dtype=torch.float).unsqueeze(1)
    div = torch.exp(torch.arange(0, d, 2).float() * (-np.log(10000.0) / d))
    ref = torch.zeros(max_len, d)
    ref[:, 0::2] = torch.sin(pos * div)
    ref[:, 1::2] = torch.cos(pos * div)
    np.testing.assert_allclose(table, ref.numpy(), atol=1e-6)

    pe = PositionalEmbedding(dim=d, dropout=0.0, max_len=max_len)
    x = np.random.RandomState(4).randn(2, 7, d).astype(np.float32)
    params = pe.init(jax.random.PRNGKey(0), jnp.array(x))
    out = pe.apply(params, jnp.array(x))
    np.testing.assert_allclose(np.asarray(out), x * np.sqrt(d) + table[:7], atol=1e-5)
    # offset path for incremental decoding
    out3 = pe.apply(params, jnp.array(x[:, 3:4]), offset=3)
    np.testing.assert_allclose(np.asarray(out3), np.asarray(out)[:, 3:4], atol=1e-6)


def test_copy_scatter_equals_onehot_bmm():
    """Scatter-add must equal bmm(weights, build_map(ids, V))
    (ref: common/Utils.py:344-355)."""
    rng = np.random.RandomState(5)
    b, t, l, v = 2, 4, 6, 11
    w = rng.rand(b, t, l).astype(np.float32)
    ids = rng.randint(0, v, size=(b, l))
    onehot = np.zeros((b, l, v), np.float32)
    for bi in range(b):
        onehot[bi, np.arange(l), ids[bi]] = 1.0
    ref = w @ onehot
    out = copy_scatter(jnp.array(w), jnp.array(ids), v)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)

    tgt = rng.randint(0, v, size=(b, t))
    ref_at = np.take_along_axis(ref, tgt[..., None], axis=-1)[..., 0]
    out_at = copy_prob_at(jnp.array(w), jnp.array(ids), jnp.array(tgt))
    np.testing.assert_allclose(np.asarray(out_at), ref_at, atol=1e-6)

    # 2-D weights path used at single decode steps
    out2 = copy_scatter(jnp.array(w[:, 0]), jnp.array(ids), v)
    np.testing.assert_allclose(np.asarray(out2), ref[:, 0], atol=1e-6)


def test_masked_mean_matches_reference():
    rng = np.random.RandomState(6)
    x = rng.randn(3, 5, 4).astype(np.float32)
    m = rng.rand(3, 5) > 0.4
    m[:, 0] = True
    ref = (x * m[..., None]).sum(1) / m.sum(1, keepdims=True)
    np.testing.assert_allclose(np.asarray(masked_mean(jnp.array(x), jnp.array(m))),
                               ref, atol=1e-6)
    ref_sqrt = (x * m[..., None]).sum(1) / np.sqrt(m.sum(1, keepdims=True))
    np.testing.assert_allclose(
        np.asarray(masked_mean(jnp.array(x), jnp.array(m), sqrt=True)), ref_sqrt, atol=1e-6)


def test_masked_softmax_fully_masked_row():
    logits = jnp.array([[1.0, 2.0, 3.0], [0.5, 0.1, 0.2]])
    mask = jnp.array([[True, False, True], [False, False, False]])
    out = np.asarray(masked_softmax(logits, mask))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out[1], 0.0)
    np.testing.assert_allclose(out[0].sum(), 1.0, atol=1e-6)
    assert out[0, 1] == 0.0


def test_embedding_pad_row_zero_and_frozen():
    emb = Embedding(vocab_size=10, features=4)
    ids = jnp.array([[0, 1, 2], [3, 0, 4]])
    params = emb.init(jax.random.PRNGKey(0), ids)
    out = emb.apply(params, ids)
    np.testing.assert_allclose(np.asarray(out)[0, 0], 0.0)
    np.testing.assert_allclose(np.asarray(out)[1, 1], 0.0)

    def loss(p):
        return jnp.sum(emb.apply(p, ids) ** 2)

    g = jax.grad(loss)(params)
    np.testing.assert_allclose(np.asarray(g["params"]["embedding"])[0], 0.0)

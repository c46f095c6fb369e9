"""Tests for auxiliary capability-parity components: the highway-gated
generic decoder layer and pretrained-embedding loading."""

import numpy as np

import jax
import jax.numpy as jnp

from case_rg_tpu.constants import SPECIAL_WORDS
from case_rg_tpu.data.embeddings import load_embedding_matrix, parse_glove_text
from case_rg_tpu.data.vocab import Vocabulary
from case_rg_tpu.ops.generic_decoder import GenericDecoderLayer


def test_generic_decoder_layer_shapes_and_grads():
    d, heads, b, lt = 16, 4, 2, 5
    layer = GenericDecoderLayer(num_memories=2, d_model=d, num_heads=heads,
                                d_ff=32, dropout=0.1)
    rng = np.random.RandomState(0)
    tgt = jnp.asarray(rng.randn(b, lt, d), jnp.float32)
    mems = [jnp.asarray(rng.randn(b, 7, d), jnp.float32),
            jnp.asarray(rng.randn(b, 9, d), jnp.float32)]
    keeps = [jnp.ones((b, 7), bool), jnp.ones((b, 9), bool)]
    params = layer.init(jax.random.PRNGKey(0), tgt, mems,
                        jnp.ones((b, lt), bool), keeps)
    out = layer.apply(params, tgt, mems, jnp.ones((b, lt), bool), keeps)
    assert out.shape == (b, lt, d)
    assert np.isfinite(np.asarray(out)).all()

    def loss(p):
        return jnp.sum(layer.apply(p, tgt, mems, jnp.ones((b, lt), bool),
                                   keeps) ** 2)

    g = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)


def test_embedding_loader(tmp_path):
    words = list(SPECIAL_WORDS) + ["alpha", "beta"]
    vocab = Vocabulary({w: i for i, w in enumerate(words)},
                       {i: w for i, w in enumerate(words)})
    glove = tmp_path / "emb.txt"
    glove.write_text("alpha 1.0 2.0 3.0\nbeta -1.0 0.5 0.25\nunused 9 9 9\n")
    m = load_embedding_matrix(str(glove), vocab, 3,
                              cache=str(tmp_path / "emb.npz"))
    assert m.shape == (len(vocab), 3)
    np.testing.assert_allclose(m[vocab.vocab2id["alpha"]], [1, 2, 3])
    np.testing.assert_allclose(m[vocab.pad_id], 0.0)
    assert (m[vocab.vocab2id["[SEP]"]] != 0).any()  # random fill
    # cache roundtrip
    m2 = load_embedding_matrix(str(glove), vocab, 3,
                               cache=str(tmp_path / "emb.npz"))
    np.testing.assert_allclose(m, m2)
    table = parse_glove_text(str(glove))
    assert set(table) == {"alpha", "beta", "unused"}


def test_serve_batch_size_knee_defaults():
    """cli/serve default batch width follows the measured knee
    (docs/PERF.md round 12): 64 for full predict, 128 for --rank_only;
    an explicit value always wins (incl. the export sidecar's)."""
    from case_rg_tpu.cli.serve import build_parser, resolve_batch_size
    assert resolve_batch_size(None, False) == 64
    assert resolve_batch_size(None, True) == 128
    assert resolve_batch_size(32, True) == 32
    assert resolve_batch_size(256, False) == 256
    # the parser must leave the default unresolved (None) so the sidecar
    # and rank-only resolution can see "user didn't ask"
    args = build_parser().parse_args(
        ["--model", "case", "--output_path", "/tmp/x",
         "--prepared_dir", "/tmp/x"])
    assert args.batch_size is None

"""Featurization parity against the reference Dataset classes.

The reference's CaSEDataset / GLKSDataset / GTTPDataset / S2SADataset /
TMemNetDataset / MasqueDataset are run (read-only import) on synthetic
word-level samples, and our fixed-shape featurizers must reproduce their
tensors exactly (up to our static right-padding of responses, which is
loss-identical under ignore_index=0)."""

import os
import random

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from case_rg_tpu.config import DataConfig
from case_rg_tpu.data.featurize import featurize
from case_rg_tpu.data.vocab import Vocabulary
from reference_loader import REFERENCE_PATH, load_reference, make_vocab

pytestmark = pytest.mark.skipif(
    not os.path.exists(REFERENCE_PATH), reason="reference not mounted")

V = 80
LQ, LP, PNUM, T = 14, 12, 3, 7


@pytest.fixture(scope="module")
def corpus():
    load_reference()
    rng = random.Random(3)
    vocab2id, id2vocab = make_vocab(V)
    words = [w for w in vocab2id if not w.startswith("[")]

    def sent(n):
        return [rng.choice(words) for _ in range(n)]

    query = {f"q{i}": sent(rng.randint(2, 6)) for i in range(8)}
    passage = {f"p{i}": sent(rng.randint(4, 18)) for i in range(6)}
    samples = []
    for i in range(5):
        pool = rng.sample(list(passage), PNUM)
        gold = rng.sample(pool, rng.randint(1, 2))
        ctx_n = rng.randint(0, 3)
        samples.append({
            "context_id": [f"q{j}" for j in rng.sample(range(8), ctx_n)],
            "query_id": f"q{rng.randint(0, 7)}",
            "passage_id": gold,
            "answer": sent(rng.randint(3, 9)),
            "passage_pool_id": pool,
        })
    # one sample with a (non-gold) pool id missing from the passage table
    last = samples[-1]
    non_gold = [p for p in last["passage_pool_id"] if p not in last["passage_id"]]
    last["passage_pool_id"] = [p if p != non_gold[0] else "missing"
                               for p in last["passage_pool_id"]]
    id2freq = {i: float(rng.randint(1, 50)) for i in range(V)}
    vocab = Vocabulary(vocab2id, id2vocab)
    cfg = DataConfig(query_len=LQ, passage_len=LP, num_passage=PNUM,
                     answer_len=T, min_window_size=4, num_windows=1)
    return samples, query, passage, vocab, vocab2id, id2vocab, id2freq, cfg


def test_case_featurization_matches_reference(corpus):
    samples, query, passage, vocab, vocab2id, id2vocab, id2freq, cfg = corpus
    from CaSE.CaSEDataset import CaSEDataset
    ref = CaSEDataset(samples, query, passage, vocab2id, id2vocab, id2freq,
                      num_passage=PNUM, context_len=LQ, passage_len=LP,
                      max_span_size=4, answer_len=T)
    ours = featurize("case", samples, query, passage, vocab, id2freq, cfg)
    for i, row in enumerate(ref.sample_tensor):
        (_id, q, p, resp, labels, tok_l, tok_w, src) = row
        np.testing.assert_array_equal(ours["query"][i, 0], q.numpy())
        np.testing.assert_array_equal(ours["passage"][i], p.numpy())
        r = resp.numpy()
        np.testing.assert_array_equal(ours["response"][i, :len(r)], r)
        assert (ours["response"][i, len(r):] == 0).all()
        np.testing.assert_allclose(ours["token_label"][i], tok_l.numpy(), atol=1e-6)
        np.testing.assert_allclose(ours["token_weight"][i], tok_w.numpy(), rtol=2e-5)
        golds = set(int(t.item()) for t in labels)
        got = set(int(g) for g in ours["passage_labels"][i] if g >= 0)
        assert got == golds
        # our derived source map == reference's explicit one
        derived = np.concatenate([ours["query"][i, 0],
                                  ours["passage"][i].reshape(-1)])
        np.testing.assert_array_equal(derived, src.numpy())


def test_glks_featurization_matches_reference(corpus):
    samples, query, passage, vocab, vocab2id, id2vocab, id2freq, cfg = corpus
    from GLKS.GLKSDataset import GLKSDataset
    ref = GLKSDataset(samples, query, passage, vocab2id, min_window_size=4,
                      num_windows=1, num_passage=PNUM, context_len=LQ,
                      passage_len=LP, answer_len=T)
    ours = featurize("glks", samples, query, passage, vocab, None, cfg)
    for i, row in enumerate(ref.sample_tensor):
        (_id, q, bg, resp, src, sel) = row
        np.testing.assert_array_equal(ours["context"][i], q.numpy())
        np.testing.assert_array_equal(ours["background"][i], bg.numpy())
        np.testing.assert_array_equal(ours["background"][i], src.numpy())
        np.testing.assert_allclose(ours["selection"][i], sel.numpy()[0], atol=1e-6)


def test_gttp_s2sa_featurization_matches_reference(corpus):
    samples, query, passage, vocab, vocab2id, id2vocab, id2freq, cfg = corpus
    from GTTP.GTTPDataset import GTTPDataset
    from S2SA.S2SADataset import S2SADataset
    for name, cls in [("gttp", GTTPDataset), ("s2sa", S2SADataset)]:
        ref = cls(samples, query, passage, vocab2id, num_passage=PNUM,
                  context_len=LQ, passage_len=LP, answer_len=T)
        ours = featurize(name, samples, query, passage, vocab, None, cfg)
        for i, row in enumerate(ref.sample_tensor):
            q, bg = row[1], row[2]
            np.testing.assert_array_equal(ours["context"][i], q.numpy())
            np.testing.assert_array_equal(ours["background"][i], bg.numpy())


def test_tmemnet_featurization_matches_reference(corpus):
    samples, query, passage, vocab, vocab2id, id2vocab, id2freq, cfg = corpus
    from TMemNet.TMemNetDataset import TMemNetDataset
    ref = TMemNetDataset(samples, query, passage, vocab2id, num_passage=PNUM,
                         context_len=LQ, passage_len=LP, answer_len=T)
    ours = featurize("tmemnet", samples, query, passage, vocab, None, cfg)
    for i, row in enumerate(ref.sample_tensor):
        (_id, q, p, labels, resp) = row
        qn = q.numpy()
        np.testing.assert_array_equal(ours["context"][i, :len(qn)], qn)
        assert (ours["context"][i, len(qn):] == 0).all()
        np.testing.assert_array_equal(ours["passage"][i], p.numpy())


def test_masque_featurization_matches_reference(corpus):
    samples, query, passage, vocab, vocab2id, id2vocab, id2freq, cfg = corpus
    from Masque.MasqueDataset import MasqueDataset
    ref = MasqueDataset(samples, query, passage, vocab2id, id2vocab, id2freq,
                        num_passage=PNUM, context_len=LQ, passage_len=LP,
                        max_span_size=2, answer_len=T)
    ours = featurize("masque", samples, query, passage, vocab, id2freq, cfg)
    for i, row in enumerate(ref.sample_tensor):
        (_id, q, p, resp, labels, _sf, _sw, src) = row
        np.testing.assert_array_equal(ours["query"][i, 0], q.numpy())
        np.testing.assert_array_equal(ours["passage"][i], p.numpy())
        derived = np.concatenate([ours["query"][i, 0],
                                  ours["passage"][i].reshape(-1)])
        np.testing.assert_array_equal(derived, src.numpy())

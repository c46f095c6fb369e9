"""Metric tests: BLEU vs nltk, ROUGE/TREC vs hand-computed values, METEOR
properties, result IO round-trip."""

import numpy as np
import pytest

from case_rg_tpu.evaluation.bleu import eval_bleu, sentence_bleu
from case_rg_tpu.evaluation.meteor import single_meteor_score
from case_rg_tpu.evaluation.overlap import eval_overlap
from case_rg_tpu.evaluation.rouge import rouge_l, rouge_n, rouge_scores
from case_rg_tpu.evaluation.trec import (average_precision, eval_trec, ndcg,
                                         parse_qrel, parse_run)
from case_rg_tpu.runtime.io import (ids_to_sentence, remove_duplicate,
                                    save_results, merge_shards)


def test_bleu_matches_nltk():
    nltk_bleu = pytest.importorskip("nltk.translate.bleu_score")
    refs = [["the", "cat", "sat", "on", "the", "mat"],
            ["a", "cat", "was", "on", "the", "mat"]]
    hyps = [["the", "cat", "sat", "on", "the", "mat"],
            ["the", "cat", "is", "on", "a", "mat"],
            ["completely", "different", "words", "here", "now"]]
    for hyp in hyps:
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            expected = nltk_bleu.sentence_bleu(refs, hyp)
        got = sentence_bleu(refs, hyp)
        assert abs(got - expected) < 1e-9 or (expected < 1e-100 and got == 0.0)


def test_rouge_hand_values():
    # identical strings -> F1 == 1
    s = rouge_scores("the cat sat", "the cat sat")
    assert abs(s["rouge_1"] - 1.0) < 1e-6
    assert abs(s["rouge_2"] - 1.0) < 1e-6
    assert abs(s["rouge_l"] - 1.0) < 1e-6
    # distinct-ngram (set) semantics: repeated words count once
    v = rouge_n(["a", "a", "b"], ["a", "c"], 1)
    # hyp set {a,b}, ref set {a,c}: overlap 1, p=1/2, r=1/2, f1=0.5
    assert abs(v - 0.5) < 1e-6
    # LCS: hyp "a b c d", ref "a c d" -> lcs 3, r=1, p=3/4
    lv = rouge_l(["a", "b", "c", "d"], ["a", "c", "d"])
    r, p = 1.0, 0.75
    beta = p / (r + 1e-12)
    expected = (1 + beta ** 2) * r * p / (r + beta ** 2 * p + 1e-12)
    assert abs(lv - expected) < 1e-6


def test_meteor_properties():
    # identical 2-word strings: 1 chunk / 2 matches -> penalty 0.0625
    assert abs(single_meteor_score(["the", "cat"], ["the", "cat"]) - 0.9375) < 1e-9
    assert single_meteor_score(["the", "cat"], ["dog"]) == 0.0
    # stem matching: running vs run
    assert single_meteor_score(["running", "fast"], ["runs", "fast"]) > 0.0


class _FakeLemma:
    def __init__(self, name):
        self._name = name

    def name(self):
        return self._name


class _FakeSynset:
    def __init__(self, words):
        self._words = words

    def lemmas(self):
        return [_FakeLemma(w) for w in self._words]


class _FakeWordnet:
    """Minimal stand-in for nltk.corpus.wordnet: word -> synsets -> lemmas.
    Includes a multiword lemma ("very_fast") to exercise nltk's '_'-lemma
    exclusion."""

    GROUPS = [["big", "large", "huge"],
              ["fast", "quick", "rapid", "very_fast"],
              ["cat", "feline"],
              ["run", "sprint"]]

    def synsets(self, word):
        return [_FakeSynset(g) for g in self.GROUPS if word in g]


def _fake_synonyms(word):
    out = {word}
    for g in _FakeWordnet.GROUPS:
        if word in g:
            out.update(w for w in g if "_" not in w)
    return out


def test_meteor_matches_nltk():
    """Exact alignment+math parity vs the installed nltk meteor_score,
    including the WordNet-synonym stage (injected fake corpus) and the
    reverse-scan latest-position pairing that drives the chunk penalty
    (ref pins nltk for this metric: evaluation/Eval_Meteor.py:2)."""
    nltk_meteor = pytest.importorskip("nltk.translate.meteor_score")
    from case_rg_tpu.evaluation.meteor import meteor_score

    fake_wn = _FakeWordnet()
    vocab = ["the", "big", "large", "cat", "feline", "ran", "run", "runs",
             "running", "fast", "quick", "sat", "mat", "dog", "a", "on",
             "The", "CAT"]  # mixed case exercises preprocess=str.lower
    rng = np.random.RandomState(7)
    for _ in range(150):
        hyp = [vocab[i] for i in rng.randint(0, len(vocab),
                                             size=rng.randint(1, 12))]
        refs = [[vocab[i] for i in rng.randint(0, len(vocab),
                                               size=rng.randint(1, 12))]
                for _ in range(rng.randint(1, 3))]
        expected = nltk_meteor.meteor_score(refs, hyp, wordnet=fake_wn)
        got = meteor_score(refs, hyp, synonyms=_fake_synonyms)
        assert abs(got - expected) < 1e-12, (hyp, refs)

    # duplicate-word pairing case where forward-first-match pairing would
    # give a different chunk count than nltk's reverse-latest pairing
    hyp = ["the", "cat", "the", "mat"]
    ref = ["the", "mat", "the", "cat"]
    expected = nltk_meteor.meteor_score([ref], hyp, wordnet=fake_wn)
    got = meteor_score([ref], hyp, synonyms=_fake_synonyms)
    assert abs(got - expected) < 1e-12


def test_meteor_variant_tag():
    from case_rg_tpu.evaluation.meteor import METEOR_VARIANT, eval_meteor
    out = eval_meteor([["the", "big", "cat"]], [[["the", "large", "cat"]]])
    assert out["METEOR_variant"] == METEOR_VARIANT
    assert METEOR_VARIANT in ("wordnet", "embedded")
    # embedded table: "big" ~ "large" must match via the synonym stage
    assert out["METEOR"] > 90.0


def test_trec_metrics():
    run = parse_run(["q1 Q0 d1 1 0.9 x", "q1 Q0 d2 2 0.8 x",
                     "q1 Q0 d3 3 0.7 x", "q2 Q0 d1 1 0.5 x"])
    qrel = parse_qrel(["q1 0 d2 1", "q1 0 d9 1", "q2 0 d1 1"])
    res = eval_trec(run, qrel)
    # q1: ranked [d1, d2, d3]; AP = (1/2)/2 = 0.25 ; q2: AP = 1
    assert abs(res["map"] - (0.25 + 1.0) / 2) < 1e-9
    # q1 recall@5 = 1/2, q2 = 1
    assert abs(res["recall_5"] - 0.75) < 1e-9
    # ndcg (trec_eval: linear gain, discount log2(max(rank,2))):
    # q1: d2 rel=1 at rank 2 -> dcg = 1/log2(2) = 1;
    #     ideal = 1/log2(2) + 1/log2(2) = 2 -> 0.5
    assert abs(res["ndcg"] - (0.5 + 1.0) / 2) < 1e-9


def test_ndcg_graded_trec_eval_semantics():
    import math
    run = parse_run(["q1 Q0 a 1 0.9 x", "q1 Q0 b 2 0.8 x", "q1 Q0 c 3 0.7 x"])
    qrel = parse_qrel(["q1 0 a 1", "q1 0 b 3", "q1 0 c 2"])
    res = eval_trec(run, qrel)
    dcg = 1 / 1 + 3 / 1 + 2 / math.log2(3)       # ranks 1,2 undiscounted
    idcg = 3 / 1 + 2 / 1 + 1 / math.log2(3)
    assert abs(res["ndcg"] - dcg / idcg) < 1e-9


def test_trec_tie_break_by_docid_desc():
    run = parse_run(["q1 Q0 aaa 1 0.5 x", "q1 Q0 zzz 2 0.5 x"])
    qrel = parse_qrel(["q1 0 zzz 1"])
    res = eval_trec(run, qrel)  # zzz ranked first on docid-desc tie-break
    assert abs(res["map"] - 1.0) < 1e-9


def test_overlap():
    out = eval_overlap([["a", "b"]], [["a", "c", "d"]])
    assert out["Overlap-1"] == 50.0


def test_remove_duplicate_reference_semantics():
    sents = [["a", "b", "c", "a", "b", "c"]]
    remove_duplicate(sents, n=3)
    assert sents[0] == ["a", "b", "c"]
    sents2 = [["x", "y"]]
    remove_duplicate(sents2, n=3)
    assert sents2[0] == ["x", "y"]


def test_save_results_and_merge(tmp_path):
    from case_rg_tpu.data.vocab import Vocabulary
    from case_rg_tpu.constants import SPECIAL_WORDS
    words = list(SPECIAL_WORDS) + ["hello", "world"]
    vocab = Vocabulary({w: i for i, w in enumerate(words)},
                       {i: w for i, w in enumerate(words)})
    meta = [{"context_id": ["1_1"], "query_id": "1_2",
             "passage_id": ["P_0"], "passage_pool_id": ["P_0", "P_1"]},
            {"context_id": [], "query_id": "2_1",
             "passage_id": ["P_1"], "passage_pool_id": ["P_1", "P_0"]}]
    batch = {"id": np.array([0, 1]), "_indices": np.array([0, 1]),
             "sample_weight": np.array([1.0, 1.0])}
    out = {"answer": np.array([[7, 8, 3, 0], [8, 7, 0, 0]]),
           "rank": np.array([[0.1, 0.9], [0.7, 0.2]])}
    save_results([(batch, out)], meta, vocab, str(tmp_path), 0, 0, "toy_test")
    merged = merge_shards(str(tmp_path / "result"))
    assert "toy_test_0" in merged
    ans = open(merged["toy_test_0"]["answer"]).read().strip().split("\n")
    assert ans[0].split("\t")[3] == "hello world"
    run_lines = open(merged["toy_test_0"]["run"]).read().strip().split("\n")
    # first sample: P_1 scored 0.9 ranked 1
    assert run_lines[0].split() == ["1_2", "Q0", "P_1", "1", "0.9", "system"]


def test_ids_to_sentence_eos_and_empty():
    from case_rg_tpu.data.vocab import Vocabulary
    from case_rg_tpu.constants import SPECIAL_WORDS
    words = list(SPECIAL_WORDS) + ["tok"]
    vocab = Vocabulary({w: i for i, w in enumerate(words)},
                       {i: w for i, w in enumerate(words)})
    assert ids_to_sentence([1, 7, 3, 7], vocab) == ["tok"]   # BOS tok EOS ...
    assert ids_to_sentence([0, 0], vocab) == ["[UNK]"]


def test_embedded_synonym_table_properties():
    """The grown table (evaluation/synonyms.py, ~550 groups) must stay
    symmetric, stem-indexed, and high-precision: it may only LOOSEN
    matching toward WordNet, never join words a reader would dispute."""
    from case_rg_tpu.evaluation.meteor import (_embedded_synonyms,
                                               _SYN_GROUPS, _SYN_INDEX,
                                               _stem)
    # symmetry: w2 in syn(w1) => w1 in syn(w2)
    for grp in _SYN_GROUPS:
        for w in grp:
            syn = _embedded_synonyms(w)
            assert grp <= syn, (w, grp - syn)
            for v in grp:
                assert w in _embedded_synonyms(v)
    # stem indexing: the synonym stage runs on Porter stems
    assert "purchase" in _embedded_synonyms(_stem("buying")) or \
           "purchas" in _embedded_synonyms(_stem("buying"))
    # precision spot checks: pairs WordNet would NOT equate in running text
    for a, b in [("man", "woman"), ("buy", "sell"),
                 ("hot", "cold"), ("good", "bad"), ("big", "small")]:
        assert b not in _embedded_synonyms(a), (a, b)
    # scale: the grown table really is in the thousands of keys
    assert len(_SYN_INDEX) > 2500


def test_embedded_synonyms_loosen_meteor():
    """A paraphrase via table synonyms scores strictly higher than with the
    synonym stage disabled, and exact matches are unaffected."""
    from case_rg_tpu.evaluation.meteor import meteor_score

    ref = "the doctor said the illness was serious".split()
    hyp = "the physician said the disease was grave".split()
    with_syn = meteor_score([ref], hyp)
    no_syn = meteor_score([ref], hyp, use_default_synonyms=False)
    assert with_syn > no_syn
    exact = "the doctor said the illness was serious".split()
    assert meteor_score([ref], exact) == meteor_score(
        [ref], exact, use_default_synonyms=False)

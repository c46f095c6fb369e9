"""Native featurization kernels vs the pure-Python specification."""

import numpy as np
import pytest

from case_rg_tpu import native
from case_rg_tpu.data.labels import case_token_labels, glks_selection_label


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_case_labels_native_matches_python():
    rng = np.random.RandomState(0)
    passages = rng.randint(0, 50, size=(4, 30)).astype(np.int32)
    passages[:, -5:] = 0
    answer = rng.randint(0, 50, size=9)
    id2freq = {i: float(rng.randint(1, 200)) for i in range(50)}
    ln, cn = case_token_labels(passages, answer, id2freq, use_native=True)
    lp, cp = case_token_labels(passages, answer, id2freq, use_native=False)
    np.testing.assert_allclose(ln, lp, atol=0)
    np.testing.assert_allclose(cn, cp, rtol=2e-5, atol=1e-6)


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_glks_labels_native_matches_python():
    rng = np.random.RandomState(1)
    bg = rng.randint(0, 40, size=57).astype(np.int32)
    answer = rng.randint(0, 40, size=8)
    for min_ws, n_win in [(4, 1), (5, 3)]:
        pn = glks_selection_label(bg, answer, min_ws, n_win, use_native=True)
        pp = glks_selection_label(bg, answer, min_ws, n_win, use_native=False)
        np.testing.assert_allclose(pn, pp, rtol=1e-6, atol=1e-7)


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_throughput_exceeds_python():
    import time
    rng = np.random.RandomState(2)
    passages = rng.randint(0, 30522, size=(10, 100)).astype(np.int32)
    answer = rng.randint(0, 30522, size=41)
    id2freq = {int(i): float(rng.randint(1, 9999))
               for i in rng.randint(0, 30522, size=5000)}
    t0 = time.time()
    for _ in range(20):
        case_token_labels(passages, answer, id2freq, use_native=True)
    t_native = time.time() - t0
    t0 = time.time()
    for _ in range(2):
        case_token_labels(passages, answer, id2freq, use_native=False)
    t_python = (time.time() - t0) * 10
    assert t_native < t_python, (t_native, t_python)


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_wordpiece_matches_python():
    """ASCII fast path is byte-identical to the Python tokenizer; non-ASCII
    input falls back to Python (Unicode normalization applies)."""
    import random
    from case_rg_tpu.data.text import WordPieceTokenizer

    vocab = {w: i for i, w in enumerate(
        ["[PAD]", "[unused0]", "[UNK]", "[unused1]", "[SEP]", "[CLS]",
         "the", "whale", "##s", "wha", "##le", "ocean", "energy", "motion",
         "kin", "##etic", ".", ",", "?", "a", "b", "c", "##a", "##b",
         "##c", "x9", "##9"])}
    tok = WordPieceTokenizer(vocab)
    assert tok._native_tokenizer() is not None
    tok_py = WordPieceTokenizer(vocab)
    tok_py._native_tried = True   # pin to the Python path

    rng = random.Random(3)
    texts = []
    for _ in range(200):
        words = ["".join(rng.choice("abc. ,?whalesoceanTHEx9\t")
                         for _ in range(rng.randint(1, 14)))
                 for _ in range(rng.randint(1, 25))]
        texts.append(" ".join(words))
    texts += ["The whales. Kinetic energy?", "", "   ", "a" * 200, "...",
              "\t\n x", "a" * 99 + " b",
              # HF control-char semantics: \x0b/\x7f/\x1f are DROPPED
              # without splitting the word ("a\x0bb" == "ab")
              "a\x0bb", "wha\x7fle", "x\x1f9", "\x0c\x0b", "a\x00b"]
    for t in texts:
        assert tok(t) == tok_py(t), repr(t[:80])

    # non-ASCII: both objects take the Python path -> identical, and the
    # Unicode accent-strip still applies
    assert tok("café whales") == tok_py("café whales")
    assert "cafe" in " ".join(tok("café")) or tok("café")

    # batched tokenization (one ctypes crossing per chunk) is byte-identical
    # to per-text calls, preserves order/empties, and a non-ASCII member
    # sends the whole batch down the per-text fallback with equal output
    batches = [texts, [], [""], ["a", "", "whales."],
               ["café whales", "the ocean"]]
    for b in batches:
        assert tok.batch(b) == [tok(t) for t in b], repr(b[:3])


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_wordpiece_faster_than_python():
    import time
    from case_rg_tpu.data.text import WordPieceTokenizer
    vocab = {w: i for i, w in enumerate(
        ["[UNK]", "the", "whale", "##s", "ocean", "a", "b", "##a", "##b",
         ".", ","])}
    tok = WordPieceTokenizer(vocab)
    assert tok._native_tokenizer() is not None
    tok_py = WordPieceTokenizer(vocab)
    tok_py._native_tried = True
    text = "the whales swim in the ocean . abab ba ab , " * 400
    t0 = time.time(); a = tok(text); t_n = time.time() - t0
    t0 = time.time(); b = tok_py(text); t_p = time.time() - t0
    assert a == b
    assert t_n < t_p, (t_n, t_p)

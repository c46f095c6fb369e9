"""Sentence-split divergence report (VERDICT r2 item 6).

The reference chunks every passage with nltk punkt
(/root/reference/Prepare_dataset.py:78); this framework's
``data/text.split_sentences`` uses punkt when its data is installed and a
curated rule-based splitter otherwise (zero-egress hosts can't download
the punkt pickle). This tool measures the rule splitter's divergence:

* against nltk ``sent_tokenize`` on any corpus you point it at, when
  punkt data is available (``--corpus file.txt``, one passage per line,
  or a reference-format ``.passage`` TSV);
* against the gold hard-case corpus (tests/test_data_pipeline.SENT_GOLD)
  always — both splitters should pass it.

Usage:
    python tools/exp_sentence_split.py [--corpus PATH ...]

Reports per-passage exact-match rate, boundary precision/recall (a
boundary = the character offset where a sentence ends), and prints the
first N disagreements.
"""

import sys


def _rule_split(text):
    """Force the rule-based path even when punkt data is installed."""
    from case_rg_tpu.data import text as T
    saved = list(T._PUNKT_CACHE)
    T._PUNKT_CACHE.clear()
    T._PUNKT_CACHE.append(None)
    try:
        return T.split_sentences(text)
    finally:
        T._PUNKT_CACHE.clear()
        T._PUNKT_CACHE.extend(saved)


def _boundaries(text, sents):
    """Character offsets (in whitespace-normalized text) of sentence
    ends — robust to splitters that strip whitespace differently."""
    norm = " ".join(text.split())
    out, pos = set(), 0
    for s in sents[:-1]:
        s_norm = " ".join(s.split())
        idx = norm.find(s_norm, pos)
        if idx < 0:
            continue
        pos = idx + len(s_norm)
        out.add(pos)
    return out


def compare(passages, other_split, other_name):
    exact = 0
    tp = fp = fn = 0
    diffs = []
    for text in passages:
        a = _rule_split(text)
        b = other_split(text)
        if a == b:
            exact += 1
        else:
            diffs.append((text, a, b))
        ba, bb = _boundaries(text, a), _boundaries(text, b)
        tp += len(ba & bb)
        fp += len(ba - bb)
        fn += len(bb - ba)
    n = len(passages)
    prec = tp / (tp + fp) if tp + fp else 1.0
    rec = tp / (tp + fn) if tp + fn else 1.0
    print(f"vs {other_name}: {exact}/{n} passages exact "
          f"({100.0 * exact / max(n, 1):.1f}%), boundary "
          f"precision {prec:.3f} recall {rec:.3f}")
    for text, a, b in diffs[:5]:
        print(f"  text: {text[:120]!r}")
        print(f"    rules: {a}")
        print(f"    {other_name}: {b}")
    return exact, n


def load_corpus(path):
    out = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            parts = line.split("\t")
            out.append(parts[1] if len(parts) >= 2 else parts[0])
    return out


def main():
    argv = list(sys.argv[1:])
    corpora = []
    while "--corpus" in argv:
        i = argv.index("--corpus")
        corpora.append(argv[i + 1])
        del argv[i:i + 2]

    sys.path.insert(0, ".")
    sys.path.insert(0, "tests")   # test_data_pipeline imports `fixtures`
    from tests.test_data_pipeline import SENT_GOLD

    gold_texts = [t for t, _ in SENT_GOLD if t.strip()]
    gold = {t: w for t, w in SENT_GOLD}
    miss = [t for t in gold_texts if _rule_split(t) != gold[t]]
    print(f"gold corpus: rules pass {len(gold_texts) - len(miss)}"
          f"/{len(gold_texts)}")
    for t in miss:
        print(f"  FAIL {t!r}: {_rule_split(t)} != {gold[t]}")

    punkt = None
    try:
        import nltk
        nltk.data.find("tokenizers/punkt")
        from nltk.tokenize import sent_tokenize
        punkt = sent_tokenize
    except Exception:
        print("punkt data NOT installed on this host — rule-vs-punkt "
              "divergence unmeasurable here (zero egress); gold corpus "
              "stands in. Install nltk punkt and rerun for the real "
              "report.")

    if punkt is not None:
        miss_p = [t for t in gold_texts if punkt(t) != gold[t]]
        print(f"gold corpus: punkt agrees {len(gold_texts) - len(miss_p)}"
              f"/{len(gold_texts)}")
        for t in miss_p:
            print(f"  punkt differs on {t!r}: {punkt(t)}")
        compare(gold_texts, punkt, "punkt")

    for path in corpora:
        passages = load_corpus(path)
        print(f"corpus {path}: {len(passages)} passages")
        if punkt is not None:
            compare(passages, punkt, "punkt")
        else:
            lens = [len(_rule_split(t)) for t in passages]
            import collections
            print("  rule-split sentence-count histogram:",
                  dict(sorted(collections.Counter(lens).items())))


if __name__ == "__main__":
    main()

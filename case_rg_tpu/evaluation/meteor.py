"""METEOR (x100, mean; max over references).

Replacement for nltk ``meteor_score`` (evaluation/Eval_Meteor.py:7-28) with
nltk's parameters (alpha=0.9, beta=3, gamma=0.5) and its staged alignment:
exact matches first, then Porter-stemmed matches. The WordNet-synonym stage
is skipped when no WordNet corpus is available in the environment (this
image has none) — a documented deviation that only loosens matching.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

try:  # Porter stemmer is pure code (no corpus download needed)
    from nltk.stem.porter import PorterStemmer
    _STEMMER = PorterStemmer()

    def _stem(w: str) -> str:
        return _STEMMER.stem(w)
except Exception:  # pragma: no cover
    def _stem(w: str) -> str:
        return w


def _match_stage(hyp_enum, ref_enum, key) -> Tuple[list, list, list]:
    """Greedy in-order matching on key(word), nltk-style: for each
    hypothesis word take the first unmatched reference word with equal key."""
    matches = []
    rest_h, used_r = [], set()
    for hi, hw in hyp_enum:
        found = False
        for rj, rw in ref_enum:
            if rj in used_r:
                continue
            if key(hw) == key(rw):
                matches.append((hi, rj))
                used_r.add(rj)
                found = True
                break
        if not found:
            rest_h.append((hi, hw))
    rest_r = [(rj, rw) for rj, rw in ref_enum if rj not in used_r]
    return matches, rest_h, rest_r


def _align(hyp: Sequence[str], ref: Sequence[str]):
    h_enum = list(enumerate(hyp))
    r_enum = list(enumerate(ref))
    exact, h_rest, r_rest = _match_stage(h_enum, r_enum, lambda w: w)
    stem, _, _ = _match_stage(h_rest, r_rest, _stem)
    return sorted(exact + stem)


def _count_chunks(matches: List[Tuple[int, int]]) -> int:
    if not matches:
        return 0
    chunks = 1
    for (h1, r1), (h2, r2) in zip(matches, matches[1:]):
        if h2 != h1 + 1 or r2 != r1 + 1:
            chunks += 1
    return chunks


def single_meteor_score(ref: Sequence[str], hyp: Sequence[str],
                        alpha: float = 0.9, beta: float = 3.0,
                        gamma: float = 0.5) -> float:
    matches = _align(hyp, ref)
    m = len(matches)
    if m == 0:
        return 0.0
    precision = m / len(hyp)
    recall = m / len(ref)
    fmean = precision * recall / (alpha * precision + (1 - alpha) * recall)
    frag = _count_chunks(matches) / m
    penalty = gamma * frag ** beta
    return (1 - penalty) * fmean


def meteor_score(references: List[Sequence[str]], hyp: Sequence[str],
                 **kw) -> float:
    return max(single_meteor_score(r, hyp, **kw) for r in references)


def eval_meteor(hyps: List[Sequence[str]], refs: List[List[Sequence[str]]]
                ) -> Dict[str, float]:
    total = sum(meteor_score(r, h) for h, r in zip(hyps, refs))
    return {"METEOR": round(total * 100 / max(len(hyps), 1), 2)}

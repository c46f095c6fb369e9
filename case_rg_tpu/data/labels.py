"""Supervision-label construction (vectorized numpy).

* CaSE supporting-token labels + confidence weights — 1/3/5-gram overlap
  against the answer, scaled by inverse log-frequency, ^0.2
  (ref: CaSE/CaSEDataset.py:6-28). Bit-compatible with the reference's
  per-token Python loops but vectorized over [num_passage, passage_len].
* GLKS sliding-window selection soft labels
  (ref: GLKS/GLKSDataset.py:6-20).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np


def _window_overlap_counts(tokens: np.ndarray, answer_set: set, size: int) -> np.ndarray:
    """For each position: |distinct window members that appear in answer_set|,
    window of ``size`` centered with (size-1)/2 zero padding (stride 1)."""
    pad = (size - 1) // 2
    padded = np.concatenate([np.zeros(pad, tokens.dtype), tokens, np.zeros(pad, tokens.dtype)])
    n = tokens.shape[0]
    out = np.empty(n, np.float32)
    windows = np.lib.stride_tricks.sliding_window_view(padded, size)
    for i in range(n):
        out[i] = len(set(windows[i].tolist()) & answer_set)
    return out


def case_token_labels(passages: np.ndarray, answer: Sequence[int],
                      id2freq: Dict[int, float]
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """passages: [P, L] int ids (padded); answer: unpadded answer ids
    (including EOS). Returns (labels [P, L], confidences [P, L])."""
    answer_set = set(int(a) for a in answer)
    p, l = passages.shape
    labels = np.zeros((p, l), np.float32)
    confs = np.zeros((p, l), np.float32)
    freq_lookup = np.vectorize(lambda t: id2freq.get(int(t), 0.0), otypes=[np.float32])
    for pi in range(p):
        toks = passages[pi]
        freq = freq_lookup(toks)
        gram1 = np.isin(toks, list(answer_set)).astype(np.float32)
        gram3 = _window_overlap_counts(toks, answer_set, 3)
        gram5 = _window_overlap_counts(toks, answer_set, 5)
        logf = np.log(freq + 2.0)
        inv = logf.sum() / logf  # scalar-sum / per-token (CaSEDataset.py:21-22)
        conf = np.power(np.maximum(inv * gram1 * gram3 * gram5, 0.0), 0.2)
        conf = np.where(gram1 > 0, conf, 1.0)
        labels[pi] = gram1
        confs[pi] = conf
    return labels, confs


def glks_selection_label(background: np.ndarray, answer: Sequence[int],
                         min_window_size: int = 5, n_windows: int = 4
                         ) -> np.ndarray:
    """Soft distribution over sliding windows of sizes
    {min_ws, 2*min_ws, ..., n*min_ws} with stride min_ws: softmax of distinct
    overlap counts with the answer (ref: GLKS/GLKSDataset.py:6-20)."""
    answer_set = set(int(a) for a in answer)
    counts = []
    window_size = min_window_size
    for _ in range(n_windows):
        n_w = (len(background) - window_size) // min_window_size + 1
        for w in range(max(n_w, 0)):
            seg = background[w * min_window_size: w * min_window_size + window_size]
            counts.append(len(set(seg.tolist()) & answer_set))
        window_size += min_window_size
    arr = np.asarray(counts, np.float32)
    e = np.exp(arr - arr.max())
    return e / e.sum()

"""Self-contained text processing: basic + WordPiece tokenization,
detokenization, sentence splitting.

The reference shells out to HuggingFace's BertTokenizer and nltk
(common/Utils.py:30-52, Prepare_dataset.py:78). This environment has no
downloaded tokenizer assets, so the framework ships its own implementations:

* ``basic_tokenize`` — BERT-uncased-style normalization: lowercase, strip
  accents, isolate punctuation;
* ``WordPieceTokenizer`` — greedy longest-match-first subword tokenization
  against a supplied vocabulary ('##' continuation convention). With a
  word-level (corpus-built) vocabulary it degrades gracefully to word-level
  lookup with UNK fallback;
* ``bert_detokenize`` — ' '.join + '##' merge (common/Utils.py:39-42);
* ``split_sentences`` — rule-based stand-in for nltk.sent_tokenize used when
  chunking passages (Prepare_dataset.py:78).
"""

from __future__ import annotations

import re
import unicodedata
from typing import Dict, Iterable, List


def _is_punct(ch: str) -> bool:
    cp = ord(ch)
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) or (123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


def basic_tokenize(text: str, lower: bool = True) -> List[str]:
    """Whitespace + punctuation splitting with BERT-style normalization."""
    if lower:
        text = text.lower()
        text = unicodedata.normalize("NFD", text)
        text = "".join(ch for ch in text if unicodedata.category(ch) != "Mn")
    tokens: List[str] = []
    buf: List[str] = []
    for ch in text:
        if ch.isspace():
            if buf:
                tokens.append("".join(buf))
                buf = []
        elif _is_punct(ch):
            if buf:
                tokens.append("".join(buf))
                buf = []
            tokens.append(ch)
        else:
            buf.append(ch)
    if buf:
        tokens.append("".join(buf))
    return tokens


class WordPieceTokenizer:
    """Greedy longest-match-first WordPiece over a vocab dict."""

    def __init__(self, vocab2id: Dict[str, int], unk_word: str = "[UNK]",
                 max_chars_per_word: int = 100, lower: bool = True):
        self.vocab2id = vocab2id
        self.unk_word = unk_word
        self.max_chars = max_chars_per_word
        self.lower = lower
        self._native = None       # C++ fast path (native/fastprep.cpp),
        self._native_tried = False  # ASCII texts only; lazy-built
        self._words: List[str] = []

    def _native_tokenizer(self):
        if not self._native_tried:
            self._native_tried = True
            try:
                from ..native import make_wordpiece
                words = [w for w, _ in sorted(self.vocab2id.items(),
                                              key=lambda kv: kv[1])]
                try:
                    unk_idx = words.index(self.unk_word)
                except ValueError:
                    unk_idx = len(words)
                    words = words + [self.unk_word]
                native = make_wordpiece(words, unk_idx)
                if native is not None:
                    self._native = native
                    self._words = words
            except Exception:
                self._native = None
        return self._native

    def wordpiece(self, word: str) -> List[str]:
        if len(word) > self.max_chars:
            return [self.unk_word]
        pieces: List[str] = []
        start = 0
        while start < len(word):
            end = len(word)
            piece = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab2id:
                    piece = sub
                    break
                end -= 1
            if piece is None:
                return [self.unk_word]
            pieces.append(piece)
            start = end
        return pieces

    def __call__(self, text: str) -> List[str]:
        # C++ fast path for ASCII text (byte-identical — tests/test_native.py);
        # non-ASCII falls through to the Python path, where Unicode
        # normalization (NFD strip, category-P punctuation) applies.
        if text.isascii():
            native = self._native_tokenizer()
            if native is not None:
                ids = native.tokenize_ids(text, self.lower, self.max_chars)
                words = self._words
                return [words[i] for i in ids.tolist()]
        out: List[str] = []
        for tok in basic_tokenize(text, lower=self.lower):
            out.extend(self.wordpiece(tok))
        return out

    def batch(self, texts: List[str]) -> List[List[str]]:
        """Tokenize many texts with one native call — byte-identical to
        ``[self(t) for t in texts]`` (tests/test_native.py). Any non-ASCII
        text (or no native library) falls back to the per-text path."""
        if texts and all(t.isascii() for t in texts):
            native = self._native_tokenizer()
            if native is not None:
                ids, lens = native.tokenize_ids_batch(texts, self.lower,
                                                      self.max_chars)
                words = self._words
                toks = [words[i] for i in ids.tolist()]
                out, pos = [], 0
                for ln in lens.tolist():
                    out.append(toks[pos:pos + ln])
                    pos += ln
                return out
        return [self(t) for t in texts]


def bert_detokenize(tokens: Iterable[str]) -> str:
    """' '.join then merge '##' continuations (ref: common/Utils.py:39-42)."""
    return " ".join(tokens).replace(" ##", "").strip()


_SENT_BOUNDARY = re.compile(
    r"(?<=[.!?])[\"')\]]*\s+(?=[\"'(\[]?[A-Z0-9])")
_ABBREV = {"mr.", "mrs.", "ms.", "dr.", "prof.", "sr.", "jr.", "st.", "vs.",
           "e.g.", "i.e.", "etc.", "u.s.", "u.k."}


def split_sentences(text: str) -> List[str]:
    """Rule-based sentence splitter (stand-in for nltk.sent_tokenize)."""
    text = text.strip()
    if not text:
        return []
    raw = _SENT_BOUNDARY.split(text)
    # re-merge splits caused by common abbreviations
    sents: List[str] = []
    for part in raw:
        part = part.strip()
        if not part:
            continue
        if sents:
            last_word = sents[-1].rsplit(None, 1)[-1].lower() if sents[-1].split() else ""
            if last_word in _ABBREV or (len(last_word) == 2 and last_word.endswith(".")):
                sents[-1] = sents[-1] + " " + part
                continue
        sents.append(part)
    return sents

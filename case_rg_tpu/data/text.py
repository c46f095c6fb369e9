"""Self-contained text processing: basic + WordPiece tokenization,
detokenization, sentence splitting.

The reference shells out to HuggingFace's BertTokenizer and nltk
(common/Utils.py:30-52, Prepare_dataset.py:78). This environment has no
downloaded tokenizer assets, so the framework ships its own implementations:

* ``basic_tokenize`` — the exact BertTokenizer BasicTokenizer algorithm
  (transformers tokenization_bert.py): invalid-char/control removal, CJK
  char isolation, NFC normalization, whitespace split, per-token
  lower + accent strip (NFD, drop Mn), punctuation split. Parity with the
  installed transformers across a Unicode gauntlet is enforced by
  tests/test_data_pipeline.py. Known reference-environment delta: the
  reference pins transformers==2.1.1 (requirements.txt:2), which lacks the
  NFC normalization step (added to HF later) — visible only on
  non-NFC-normalized input whose composed form changes a char class;
* ``WordPieceTokenizer`` — greedy longest-match-first subword tokenization
  against a supplied vocabulary ('##' continuation convention), with
  HF-style ``never_split`` special-token handling. With a word-level
  (corpus-built) vocabulary it degrades gracefully to word-level lookup
  with UNK fallback;
* ``bert_detokenize`` — ' '.join + '##' merge (common/Utils.py:39-42);
* ``split_sentences`` — rule-based stand-in for nltk.sent_tokenize used when
  chunking passages (Prepare_dataset.py:78). nltk's punkt model is a
  trained pickle unavailable offline, so sentence-boundary parity with the
  reference prep is approximate by construction (documented deviation).
"""

from __future__ import annotations

import re
import unicodedata
from typing import Dict, Iterable, List, Sequence, Tuple

BERT_SPECIAL_TOKENS = ("[UNK]", "[SEP]", "[PAD]", "[CLS]", "[MASK]")


def _is_punct(ch: str) -> bool:
    cp = ord(ch)
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) or (123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


def _is_whitespace(ch: str) -> bool:
    # HF _is_whitespace: \t \n \r + category Zs (NOT Python str.isspace,
    # which also accepts Zl/Zp/\x0b/\x0c/\x1c-\x1f)
    if ch in " \t\n\r":
        return True
    return unicodedata.category(ch) == "Zs"


def _is_control(ch: str) -> bool:
    if ch in "\t\n\r":
        return False
    return unicodedata.category(ch).startswith("C")


def _is_cjk(cp: int) -> bool:
    return ((0x4E00 <= cp <= 0x9FFF) or (0x3400 <= cp <= 0x4DBF)
            or (0x20000 <= cp <= 0x2A6DF) or (0x2A700 <= cp <= 0x2B73F)
            or (0x2B740 <= cp <= 0x2B81F) or (0x2B820 <= cp <= 0x2CEAF)
            or (0xF900 <= cp <= 0xFAFF) or (0x2F800 <= cp <= 0x2FA1F))


def _clean_text(text: str) -> str:
    out = []
    for ch in text:
        cp = ord(ch)
        if cp == 0 or cp == 0xFFFD or _is_control(ch):
            continue
        out.append(" " if _is_whitespace(ch) else ch)
    return "".join(out)


def _strip_accents(token: str) -> str:
    token = unicodedata.normalize("NFD", token)
    return "".join(ch for ch in token
                   if unicodedata.category(ch) != "Mn")


def _split_on_punc(token: str) -> List[str]:
    out: List[List[str]] = []
    new_word = True
    for ch in token:
        if _is_punct(ch):
            out.append([ch])
            new_word = True
        else:
            if new_word:
                out.append([])
            new_word = False
            out[-1].append(ch)
    return ["".join(p) for p in out]


def basic_tokenize(text: str, lower: bool = True,
                   never_split: Sequence[str] = ()) -> List[str]:
    """The BertTokenizer BasicTokenizer algorithm, step for step:
    clean (drop NUL/U+FFFD/controls, map whitespace to ' '), isolate CJK
    chars, NFC-normalize, whitespace-split, then per token lower + strip
    accents (unless the token is in ``never_split``) and split punctuation.
    """
    text = _clean_text(text)
    if any(_is_cjk(ord(ch)) for ch in text):
        text = "".join(f" {ch} " if _is_cjk(ord(ch)) else ch for ch in text)
    text = unicodedata.normalize("NFC", text)
    ns = set(never_split)
    tokens: List[str] = []
    for token in text.split():
        if token in ns:
            tokens.append(token)
            continue
        if lower:
            token = _strip_accents(token.lower())
        tokens.extend(_split_on_punc(token))
    return tokens


class WordPieceTokenizer:
    """Greedy longest-match-first WordPiece over a vocab dict.

    ``never_split`` reproduces HF's special-token handling: the text is
    first split on exact special-token substrings (HF's trie split), the
    specials pass through whole, and the remaining segments go through
    basic + wordpiece tokenization."""

    def __init__(self, vocab2id: Dict[str, int], unk_word: str = "[UNK]",
                 max_chars_per_word: int = 100, lower: bool = True,
                 never_split: Sequence[str] = BERT_SPECIAL_TOKENS):
        self.vocab2id = vocab2id
        self.unk_word = unk_word
        self.max_chars = max_chars_per_word
        self.lower = lower
        self.never_split = tuple(sorted(never_split, key=len, reverse=True))
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

    def _has_special(self, text: str) -> bool:
        return any(s in text for s in self.never_split)

    def _tokenize_segments(self, text: str) -> List[str]:
        """HF split_on_tokens: cut the text at exact special-token
        substrings; specials pass through whole, segments get basic +
        wordpiece."""
        segments: List[Tuple[str, bool]] = [(text, False)]
        for sp in self.never_split:
            nxt: List[Tuple[str, bool]] = []
            for seg, is_sp in segments:
                if is_sp or sp not in seg:
                    nxt.append((seg, is_sp))
                    continue
                parts = seg.split(sp)
                for i, part in enumerate(parts):
                    if part:
                        nxt.append((part, False))
                    if i < len(parts) - 1:
                        nxt.append((sp, True))
            segments = nxt
        out: List[str] = []
        for seg, is_sp in segments:
            if is_sp:
                out.append(seg)
            else:
                for tok in basic_tokenize(seg, lower=self.lower):
                    out.extend(self.wordpiece(tok))
        return out

    def __call__(self, text: str) -> List[str]:
        # C++ fast path for ASCII text (byte-identical — tests/test_native.py);
        # non-ASCII falls through to the Python path, where Unicode
        # normalization (CJK isolation, NFC, NFD accent strip, category-P
        # punctuation) applies. Texts containing special tokens take the
        # Python never_split path (substring check is a conservative
        # superset of HF's exact split — routing only).
        if self._has_special(text):
            return self._tokenize_segments(text)
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
        if texts and all(t.isascii() and not self._has_special(t)
                         for t in texts):
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

"""Word tokenization with reference-compatible behavior.

The PyTorch reference tokenizes every caption with ``nltk.word_tokenize``
(e.g. /root/reference/build_vocab.py:46, /root/reference/data_loader.py:92).
``nltk.word_tokenize`` = punkt sentence split + TreebankWordTokenizer; punkt
requires downloaded model data, but captions are single sentences with the
final period already stripped by the callers, so the Treebank word tokenizer
alone produces identical output on this corpus.  We use nltk's (data-free)
``TreebankWordTokenizer`` when nltk is importable and fall back to a pure
regex re-implementation of the same rules otherwise.
"""

from __future__ import annotations

import re
from typing import List

_TREEBANK = None


def _get_treebank():
    global _TREEBANK
    if _TREEBANK is None:
        try:
            from nltk.tokenize import TreebankWordTokenizer

            _TREEBANK = TreebankWordTokenizer()
        except Exception:  # pragma: no cover - nltk is baked into the image
            _TREEBANK = False
    return _TREEBANK


# --- regex fallback: the Treebank rules that matter for caption text ---
_CONTRACTIONS2 = [
    re.compile(r"(?i)\b(can)(?#X)(not)\b"),
    re.compile(r"(?i)\b(d)(?#X)('ye)\b"),
    re.compile(r"(?i)\b(gim)(?#X)(me)\b"),
    re.compile(r"(?i)\b(gon)(?#X)(na)\b"),
    re.compile(r"(?i)\b(got)(?#X)(ta)\b"),
    re.compile(r"(?i)\b(lem)(?#X)(me)\b"),
    re.compile(r"(?i)\b(more)(?#X)('n)\b"),
    re.compile(r"(?i)\b(wan)(?#X)(na)(?=\s)"),
]
_CONTRACTIONS3 = [
    re.compile(r"(?i) ('t)(?#X)(is)\b"),
    re.compile(r"(?i) ('t)(?#X)(was)\b"),
]


def _treebank_regex_tokenize(text: str) -> List[str]:
    # starting quotes
    text = re.sub(r"^\"", r"``", text)
    text = re.sub(r"(``)", r" \1 ", text)
    text = re.sub(r"([ (\[{<])(\"|\'{2})", r"\1 `` ", text)
    # punctuation
    text = re.sub(r"([:,])([^\d])", r" \1 \2", text)
    text = re.sub(r"([:,])$", r" \1 ", text)
    text = re.sub(r"\.\.\.", r" ... ", text)
    text = re.sub(r"[;@#$%&]", r" \g<0> ", text)
    text = re.sub(r'([^\.])(\.)([\]\)}>"\']*)\s*$', r"\1 \2\3 ", text)
    text = re.sub(r"[?!]", r" \g<0> ", text)
    text = re.sub(r"([^'])' ", r"\1 ' ", text)
    # parens, brackets, etc.
    text = re.sub(r"[\]\[\(\)\{\}<>]", r" \g<0> ", text)
    text = re.sub(r"--", r" -- ", text)
    # add extra space to make things easier
    text = " " + text + " "
    # ending quotes
    text = re.sub(r'"', " '' ", text)
    text = re.sub(r"(\S)(\'\')", r"\1 \2 ", text)
    text = re.sub(r"([^' ])('[sS]|'[mM]|'[dD]|') ", r"\1 \2 ", text)
    text = re.sub(r"([^' ])('ll|'LL|'re|'RE|'ve|'VE|n't|N'T) ", r"\1 \2 ", text)
    for regexp in _CONTRACTIONS2:
        text = regexp.sub(r" \1 \2 ", text)
    for regexp in _CONTRACTIONS3:
        text = regexp.sub(r" \1 \2 ", text)
    return text.split()


def word_tokenize(text: str) -> List[str]:
    """Tokenize a caption string into words (reference-parity)."""
    tb = _get_treebank()
    if tb:
        return tb.tokenize(text)
    return _treebank_regex_tokenize(text)

"""Vocabulary with reference-identical token/id semantics.

Mirrors the reference ``Vocab`` (/root/reference/build_vocab.py:7-56): special
tokens ``<pad> <s> </s> <unk>`` at ids 0-3 and the FlickrStyle style words
``factual humorous romantic`` at ids 4-6, followed by corpus words in
first-seen order; factual-corpus words are filtered by min count 2.  Unknown
lookups map to ``<unk>``.  The shipped ``data/vocab.pkl`` (9,684 entries) can
be loaded via :func:`load_vocab_pickle`, which installs the import shims the
reference pickle needs (it was pickled against ``__main__.Vocab``).
"""

from __future__ import annotations

import pickle
import re
import sys
import types
from collections import Counter
from typing import Dict, Iterable, List, Optional, Sequence

from captionax.core.tokenize import word_tokenize

PAD, BOS, EOS, UNK = "<pad>", "<s>", "</s>", "<unk>"
SPECIAL_TOKENS = (PAD, BOS, EOS, UNK)
STYLE_TOKENS = ("factual", "humorous", "romantic")

PAD_ID, BOS_ID, EOS_ID, UNK_ID = 0, 1, 2, 3


class Vocab:
    """word <-> id bidirectional map with ``<unk>`` fallback."""

    def __init__(self):
        self.w2i: Dict[str, int] = {}
        self.i2w: Dict[int, str] = {}
        self.ix = 0

    def add_word(self, word: str) -> None:
        if word not in self.w2i:
            self.w2i[word] = self.ix
            self.i2w[self.ix] = word
            self.ix += 1

    def __call__(self, word: str) -> int:
        return self.w2i.get(word, self.w2i[UNK])

    def __len__(self) -> int:
        return len(self.w2i)

    # -- conveniences the reference lacks ------------------------------
    def encode(self, text_or_tokens, add_bos_eos: bool = True) -> List[int]:
        """Caption string/tokens -> id list, mirroring the dataset encoding
        at /root/reference/data_loader.py:91-97 (strip '.', lowercase,
        tokenize, wrap in <s>...</s>)."""
        if isinstance(text_or_tokens, str):
            tokens = word_tokenize(re.sub(r"\.", "", text_or_tokens).lower())
        else:
            tokens = list(text_or_tokens)
        ids = [self(t) for t in tokens]
        if add_bos_eos:
            return [self(BOS)] + ids + [self(EOS)]
        return ids

    def decode(self, ids: Iterable[int], stop_at_eos: bool = True) -> List[str]:
        """id sequence -> word list, skipping <pad>/<s>, stopping at </s>
        (the ``cap_to_text_gt`` semantics, /root/reference/utils.py:177-190)."""
        words = []
        for i in ids:
            w = self.i2w.get(int(i), UNK)
            if w in (PAD, BOS):
                continue
            if stop_at_eos and w == EOS:
                break
            words.append(w)
        return words


def build_vocab(
    factual_captions: Optional[Iterable[str]] = None,
    styled_captions: Sequence[Iterable[str]] = (),
    min_count_factual: int = 2,
) -> Vocab:
    """Build a vocabulary from caption text.

    Reference semantics (/root/reference/build_vocab.py:29-56): specials +
    style words first; factual words are concatenated into one corpus string,
    tokenized, and kept if count >= 2 in **first-seen order of the Counter**;
    styled corpora contribute every token.  Caption lines should already have
    image-name prefixes removed; we strip periods and lowercase here, same as
    ``extract_captions``.
    """
    vocab = Vocab()
    for tok in SPECIAL_TOKENS + STYLE_TOKENS:
        vocab.add_word(tok)

    def corpus_tokens(lines: Iterable[str]) -> List[str]:
        text = " ".join(line.replace(".", "").strip() for line in lines)
        return word_tokenize(text.strip().lower())

    if factual_captions is not None:
        counter = Counter(corpus_tokens(factual_captions))
        for word, cnt in counter.items():
            if cnt >= min_count_factual:
                vocab.add_word(word)
    for styled in styled_captions:
        for word in corpus_tokens(styled):
            vocab.add_word(word)
    return vocab


def extract_factual_caption_lines(path: str) -> List[str]:
    """Read a FlickrStyle factual file (``name.jpg#k\\tcaption``) and return
    caption strings with the image-name prefix removed
    (/root/reference/build_vocab.py:62-71)."""
    r = re.compile(r"\d*.jpg#\d*")
    out = []
    with open(path, "r") as f:
        for line in f:
            out.append(r.sub("", line))
    return out


def _install_pickle_shims() -> None:
    """The shipped vocab.pkl was pickled against ``__main__.Vocab`` (and some
    checkpoints against ``build_vocab.Vocab``); route both to our class."""
    main_mod = sys.modules.get("__main__")
    if main_mod is not None and not hasattr(main_mod, "Vocab"):
        main_mod.Vocab = Vocab
    if "build_vocab" not in sys.modules:
        shim = types.ModuleType("build_vocab")
        shim.Vocab = Vocab
        sys.modules["build_vocab"] = shim


def load_vocab_pickle(path: str) -> Vocab:
    """Load a reference-format vocab pickle and rewrap it as our Vocab."""
    _install_pickle_shims()
    with open(path, "rb") as f:
        raw = pickle.load(f)
    vocab = Vocab()
    vocab.w2i = dict(raw.w2i)
    vocab.i2w = {int(k): v for k, v in raw.i2w.items()}
    vocab.ix = int(raw.ix)
    return vocab

"""Vocabulary semantics tests against the reference format."""

import numpy as np

from captionax.core.vocab import (
    BOS_ID,
    EOS_ID,
    PAD_ID,
    UNK_ID,
    Vocab,
    build_vocab,
)


class TestSpecialIds:
    def test_layout(self, tiny_vocab):
        v = tiny_vocab
        assert v.w2i["<pad>"] == PAD_ID == 0
        assert v.w2i["<s>"] == BOS_ID == 1
        assert v.w2i["</s>"] == EOS_ID == 2
        assert v.w2i["<unk>"] == UNK_ID == 3
        assert v.w2i["factual"] == 4
        assert v.w2i["humorous"] == 5
        assert v.w2i["romantic"] == 6

    def test_unk_fallback(self, tiny_vocab):
        assert tiny_vocab("no-such-word-xyzzy") == UNK_ID

    def test_min_count_factual(self):
        v = build_vocab(["unique word word"], [])
        assert "word" in v.w2i  # count 2 -> kept
        assert "unique" not in v.w2i  # count 1 -> dropped

    def test_styled_no_min_count(self):
        v = build_vocab(None, [["singular appearance"]])
        assert "singular" in v.w2i and "appearance" in v.w2i


class TestEncodeDecode:
    def test_roundtrip(self, tiny_vocab):
        v = tiny_vocab
        ids = v.encode("A dog runs in the grass.")
        assert ids[0] == BOS_ID and ids[-1] == EOS_ID
        assert v.decode(ids) == ["a", "dog", "runs", "in", "the", "grass"]

    def test_decode_stops_at_eos(self, tiny_vocab):
        v = tiny_vocab
        ids = [BOS_ID, v("dog"), EOS_ID, v("grass"), PAD_ID]
        assert v.decode(ids) == ["dog"]

    def test_decode_skips_pad(self, tiny_vocab):
        v = tiny_vocab
        assert v.decode([PAD_ID, v("dog"), PAD_ID]) == ["dog"]


class TestReferencePickle:
    def test_load_shipped_vocab(self, ref_vocab):
        v = ref_vocab
        assert len(v) == 9684  # SURVEY.md §2.1
        assert v.w2i["<pad>"] == 0
        assert v.w2i["romantic"] == 6
        assert v.i2w[0] == "<pad>"

    def test_shipped_vocab_lookup(self, ref_vocab):
        v = ref_vocab
        ids = np.array(v.encode("a man is riding a bicycle"))
        assert (ids != UNK_ID).all()

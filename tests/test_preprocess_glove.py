"""Preprocess CLI and GloVe loader tests."""

import os

import numpy as np
import pytest

from captionax.cli.preprocess import main as preprocess_main
from captionax.data.cc import SEP, load_cc_captions

CC = "/root/reference/data/200_conceptual_train.txt"

needs_ref = pytest.mark.skipif(
    not os.path.exists(CC), reason="reference data not mounted"
)


class TestPreprocess:
    @needs_ref
    def test_cc_split_partitions(self, tmp_path):
        prefix = str(tmp_path / "split")
        preprocess_main([
            "cc-split", "--captions", CC, "--out-prefix", prefix,
            "--val-per-domain", "1", "--test-per-domain", "1",
        ])
        tr = load_cc_captions(prefix + "_train.txt")
        va = load_cc_captions(prefix + "_val.txt")
        te = load_cc_captions(prefix + "_test.txt")
        total = len(load_cc_captions(CC))
        assert len(tr) + len(va) + len(te) == total
        # one val/test per domain
        assert len({d for _, _, d in va}) == len(va)

    @needs_ref
    def test_merge_all(self, tmp_path):
        factual = tmp_path / "factual.txt"
        factual.write_text("img1.jpg#0\tA dog runs .\nimg1.jpg#1\tA dog sits .\n")
        humour = tmp_path / "humour.txt"
        humour.write_text("a dog dreams of victory\n")
        out = tmp_path / "all.txt"
        preprocess_main([
            "merge-all", "--cc", CC, "--factual", str(factual),
            "--humour", str(humour), "--out", str(out),
        ])
        rows = load_cc_captions(str(out))
        doms = {d for _, _, d in rows}
        assert "f" in doms and "h" in doms
        assert len(rows) == len(load_cc_captions(CC)) + 3

    def test_gcc_select(self, tmp_path):
        tsv = tmp_path / "gcc.tsv"
        lines = []
        for i in range(30):
            lines.append(f"caption {i}\thttps://www.alamy.com/{i}.jpg")
        for i in range(3):
            lines.append(f"rare {i}\thttps://rare-site.com/{i}.jpg")
        tsv.write_text("\n".join(lines))
        out = tmp_path / "sel.txt"
        preprocess_main([
            "gcc-select", "--tsv", str(tsv), "--out", str(out),
            "--per-domain", "20", "--min-per-domain", "5",
        ])
        rows = load_cc_captions(str(out))
        assert len(rows) == 20  # alamy capped at 20; rare-site dropped (<5)
        assert os.path.exists(str(out) + ".urls")

    def test_shuffle_deterministic(self, tmp_path):
        src = tmp_path / "in.txt"
        src.write_text("\n".join(f"line{i}" for i in range(20)) + "\n")
        o1, o2 = tmp_path / "o1.txt", tmp_path / "o2.txt"
        preprocess_main(["shuffle", "--infile", str(src), "--out", str(o1),
                         "--seed", "7"])
        preprocess_main(["shuffle", "--infile", str(src), "--out", str(o2),
                         "--seed", "7"])
        assert o1.read_text() == o2.read_text() != src.read_text()


class TestGlove:
    def test_embedding_matrix(self, tiny_vocab, tmp_path):
        from captionax.data.glove import glove_embedding_matrix

        path = tmp_path / "glove.txt"
        dim = 4
        path.write_text(
            "dog 1.0 2.0 3.0 4.0\n"
            "grass 0.1 0.2 0.3 0.4\n"
            "notinvocab 9 9 9 9\n"
        )
        mat = glove_embedding_matrix(str(path), tiny_vocab, dim)
        assert mat.shape == (len(tiny_vocab), dim)
        np.testing.assert_allclose(
            np.asarray(mat[tiny_vocab("dog")]), [1, 2, 3, 4]
        )
        # OOV rows are random-normal, not zero ('norm' init mode)
        assert np.abs(np.asarray(mat[tiny_vocab("a")])).sum() > 0

"""Smoke the two measured-study harnesses end-to-end on tiny corpora.

These are the scripts that produce the BASELINE.md CC A/B and combined
Flickr+CC evidence (`benchmarks/cc_gru_vs_hypernet.py`,
`benchmarks/combine_study.py`); trained artifacts are cleaned between
rounds, so the protocol itself must stay runnable.  Each smoke
pre-seeds tiny cc_seen/cc_zeroshot files into a tmp OUT_DIR —
``split_files`` short-circuits when they exist — so the real 7.6k-row
corpus never enters the test.
"""

import importlib
import json
import os
import sys

import pytest

BENCH_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benchmarks")

SLOW = os.environ.get("CAPTIONAX_SLOW_TESTS", "") == "1"

SEP = " " * 5
SEEN_DOMAINS = ("alamy", "dailymail", "wordpress")
ZS_DOMAINS = ("windows", "9gag", "twincities")


def _seed_corpus(out_dir, per_domain=8, zs_per_domain=4):
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "cc_seen.txt"), "w") as f:
        for d in SEEN_DOMAINS:
            for i in range(per_domain):
                f.write(f"{d}_{i}.jpg{SEP}a small {d} test caption "
                        f"number {i}{SEP}{d}\n")
    with open(os.path.join(out_dir, "cc_zeroshot.txt"), "w") as f:
        for d in ZS_DOMAINS:
            for i in range(zs_per_domain):
                f.write(f"{d}_{i}.jpg{SEP}an unseen {d} picture "
                        f"number {i}{SEP}{d}\n")


def _load(name):
    if BENCH_DIR not in sys.path:
        sys.path.insert(0, BENCH_DIR)
    return importlib.import_module(name)


@pytest.mark.skipif(not SLOW, reason="long-tail smoke (~3.5 min); set "
                    "CAPTIONAX_SLOW_TESTS=1")
def test_cc_ab_harness_tiny(tmp_path, monkeypatch):
    mod = _load("cc_gru_vs_hypernet")
    out = str(tmp_path / "parity")
    _seed_corpus(out)
    monkeypatch.setattr(mod, "OUT_DIR", out)
    mod.main(["--phase", "all", "--epochs", "1", "--batch-size", "8",
              "--encoder-depth", "50", "--tag", "_test",
              "--platform", "cpu"])
    for kind in ("gru", "hypernet"):
        d = json.load(open(os.path.join(out, f"cc_ab_{kind}_test.json")))
        assert set(d) >= {"history", "seen_test", "zero_shot"}
        for split in ("seen_test", "zero_shot"):
            assert d[split]["tf_bleu1"] >= 0.0
            assert "beam_corpus_cider" in d[split]


@pytest.mark.skipif(not SLOW, reason="long-tail smoke; set "
                    "CAPTIONAX_SLOW_TESTS=1")
def test_combine_harness_tiny(tmp_path, monkeypatch):
    mod = _load("combine_study")
    out = str(tmp_path / "parity")
    _seed_corpus(out)
    monkeypatch.setattr(mod, "OUT_DIR", out)
    monkeypatch.setattr(mod, "CKPT", os.path.join(out, "ckpt_combine"))
    monkeypatch.setattr(mod, "PROBE_PATH",
                        os.path.join(out, "combine_probe.pkl"))
    mod.main(["--phase", "all", "--epochs", "1", "--images", "8",
              "--batch-size", "8", "--encoder-depth", "50",
              "--max-steps", "6", "--sep-images", "8", "--cc-conds", "2",
              "--probe-epochs", "2", "--platform", "cpu"])
    sep = json.load(open(os.path.join(out, "combine_sep.json")))
    assert set(sep["matrix"]) >= {"factual", "humour", "romantic"}
    assert 0.0 <= sep["overall_acc"] <= 1.0
    testall = json.load(open(os.path.join(out, "combine_testall.json")))
    assert len(testall) == 5  # 3 Flickr styles + CC seen + CC zero-shot

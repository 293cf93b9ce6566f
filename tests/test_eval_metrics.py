"""Metric parity tests: our scorers vs the reference's vendored ones.

The vendored coco-caption CIDEr in /root/reference defines score parity
(SURVEY.md §7.2 step 2).  We import the reference module at runtime as a
test oracle — no reference code is copied."""

import importlib.util
import math
import os
import sys

import numpy as np
import pytest

from captionax.eval.bleu import corpus_bleu
from captionax.eval.cider import Cider, cider_score
from captionax.eval.meteor import meteor_score
from captionax.eval.rouge import rouge_l

REF = "/root/reference"

HYPS = [
    "a child in a pink dress is climbing stairs",
    "a dog runs in the grass",
    "two men are playing chess in a park",
    "a child in a pink dress is climbing stairs",
]
REFS = [
    ["a child in a pink dress is climbing up a set of stairs"],
    ["a dog runs after a ball in the green grass"],
    ["two men play chess outdoors in the park"],
    ["a little girl climbing the stairs to her playhouse"],
]


def _load_ref_cider():
    if not os.path.isdir(REF):
        pytest.skip("reference not mounted")
    try:
        import six  # noqa: F401
    except ImportError:
        pytest.skip("reference cider needs six")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    spec = importlib.util.spec_from_file_location(
        "ref_cider_scorer", os.path.join(REF, "cider_scorer.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["cider_scorer"] = mod
    spec.loader.exec_module(mod)
    return mod


class TestCiderParity:
    def test_matches_vendored_scorer(self):
        mod = _load_ref_cider()
        ref_scorer = mod.CiderScorer(n=4)
        for hyp, refs in zip(HYPS, REFS):
            ref_scorer += (hyp, refs)
        ref_mean, ref_scores = ref_scorer.compute_score()

        our_mean, our_scores = cider_score(HYPS, REFS)
        np.testing.assert_allclose(our_scores, ref_scores, rtol=1e-9)
        assert math.isclose(our_mean, ref_mean, rel_tol=1e-9)

    def test_gts_res_interface(self):
        gts = {i: REFS[i] for i in range(len(HYPS))}
        res = [{"image_id": i, "caption": [HYPS[i]]} for i in range(len(HYPS))]
        mean1, _ = Cider().compute_score(gts, res)
        mean2, _ = cider_score(HYPS, REFS)
        assert math.isclose(mean1, mean2, rel_tol=1e-12)

    def test_identical_caption_scores_high(self):
        # corpus-mode idf needs >1 image (log(num_images) ref length)
        _, scores = cider_score(
            ["a dog runs in the grass", "two men play chess"],
            [["a dog runs in the grass"], ["two men play chess outdoors"]],
        )
        assert scores[0] > 9.99  # cosine 1.0 on every n-gram order, x10

    def test_disjoint_caption_scores_zero(self):
        _, scores = cider_score(
            ["xyzzy plugh", "two men play chess"],
            [["a dog runs in the grass"], ["two men play chess outdoors"]],
        )
        assert scores[0] == 0.0


class TestBleu:
    def test_perfect_match(self):
        out = corpus_bleu([["a", "b", "c", "d"]], [[["a", "b", "c", "d"]]])
        assert math.isclose(out["bleu"], 1.0)

    def test_known_value(self):
        # hand-checked: hyp 4-grams vs ref; order-1 precision 5/6
        hyp = ["the", "cat", "sat", "on", "the", "mat"]
        ref = ["the", "cat", "is", "on", "the", "mat"]
        out = corpus_bleu([hyp], [[ref]], max_order=1)
        assert math.isclose(out["bleu"], 5 / 6, rel_tol=1e-12)

    def test_brevity_penalty(self):
        hyp = ["the", "cat"]
        ref = ["the", "cat", "sat", "on", "the", "mat"]
        out = corpus_bleu([hyp], [[ref]], max_order=1)
        assert math.isclose(out["brevity_penalty"], math.exp(1 - 6 / 2))

    def test_nltk_cross_check(self):
        nltk = pytest.importorskip("nltk")
        from nltk.translate.bleu_score import corpus_bleu as nltk_bleu

        hyps = [h.split() for h in HYPS]
        refs = [[r.split() for r in rs] for rs in REFS]
        ours = corpus_bleu(hyps, refs, max_order=4)["bleu"]
        theirs = nltk_bleu(refs, hyps, weights=(0.25,) * 4)
        assert math.isclose(ours, theirs, rel_tol=1e-9)


class TestRouge:
    def test_perfect(self):
        p, r, f = rouge_l("a dog runs", "a dog runs")
        assert (p, r, f) == (1.0, 1.0, 1.0)

    def test_known_lcs(self):
        # hyp: "a b c d", ref: "a c d e" -> LCS = a c d = 3
        p, r, f = rouge_l("a b c d", "a c d e")
        assert math.isclose(p, 3 / 4) and math.isclose(r, 3 / 4)

    def test_rouge_score_pkg_cross_check(self):
        rs = pytest.importorskip("rouge_score.rouge_scorer")
        scorer = rs.RougeScorer(["rougeL"], use_stemmer=False)
        for hyp, refs in zip(HYPS, REFS):
            theirs = scorer.score(refs[0], hyp)["rougeL"]
            p, r, f = rouge_l(hyp, refs[0])
            assert math.isclose(f, theirs.fmeasure, rel_tol=1e-9)


class TestMeteor:
    def test_perfect(self):
        s = meteor_score("a dog runs", "a dog runs")
        # P=R=1, fmean=1, one chunk: penalty = 0.5*(1/3)^3
        assert math.isclose(s, 1 - 0.5 * (1 / 3) ** 3, rel_tol=1e-9)

    def test_no_match(self):
        assert meteor_score("xyzzy", "a dog runs") == 0.0

    def test_stem_stage(self):
        # "climbing" vs "climbs" match via Porter stem
        assert meteor_score("a child climbing", "a child climbs") > 0.5

    def test_nltk_cross_check_exact_stage(self):
        pytest.importorskip("nltk")
        try:
            from nltk.translate.meteor_score import single_meteor_score

            theirs = single_meteor_score(
                "the cat sat on the mat".split(), "the cat sat on a mat".split()
            )
        except LookupError:
            pytest.skip("nltk wordnet data not installed")
        ours = meteor_score("the cat sat on a mat", "the cat sat on the mat")
        assert math.isclose(ours, theirs, rel_tol=1e-6)


class TestMetricScore:
    def test_logits_pipeline(self, tiny_vocab):
        from captionax.eval.metrics import metric_score

        v = tiny_vocab
        ids = np.array([v.encode("a dog runs in the grass")])
        T = ids.shape[1]
        logits = np.full((1, T, len(v)), -10.0, dtype=np.float32)
        for t in range(T - 1):  # predict caps shifted: outputs[t] ~ caps[t]
            logits[0, t, ids[0, t + 1]] = 10.0
        logits[0, T - 1, 0] = 10.0
        out = metric_score(ids, logits, v)
        # prediction drops <s> alignment => near-perfect overlap
        assert out["bleu1"] > 0.8
        assert out["cider"] >= 0.0


class TestMeteorSynonymStage:
    """The pluggable stage-3 synonym match (WordNet absent in-image;
    measured effect: benchmarks/meteor_wordnet_delta.py, BASELINE.md)."""

    def test_lite_synonyms_add_matches(self):
        from captionax.eval.meteor import meteor_score
        from captionax.eval.wordnet_lite import lite_syns

        base = meteor_score("a kid climbs the rock", "a child climbs the stone")
        with_syn = meteor_score("a kid climbs the rock",
                                "a child climbs the stone",
                                synonyms=lite_syns)
        assert with_syn > base
        # kid~child and rock~stone both match -> perfect alignment
        assert math.isclose(with_syn, 1 - 0.5 * (1 / 5) ** 3, rel_tol=1e-9)

    def test_lite_table_is_symmetric_and_reflexive(self):
        from captionax.eval.wordnet_lite import LITE_SYNONYMS

        for w, syns in LITE_SYNONYMS.items():
            assert w in syns
            for s in syns:
                if s in LITE_SYNONYMS:
                    assert w in LITE_SYNONYMS[s], (w, s)

    def test_without_synonyms_unchanged(self):
        from captionax.eval.meteor import meteor_score

        # default path (no wordnet, no table) stays exact+stem
        assert meteor_score("a kid runs", "a child runs") < 1.0

    def test_measured_delta_is_marginal(self):
        """The curated-table delta on real caption pairs stays small —
        the quantified version of round 1's 'marginal' claim."""
        from benchmarks.meteor_wordnet_delta import base_and_ub
        from captionax.data.flickr import load_factual_captions
        from captionax.eval.meteor import meteor_score
        from captionax.eval.wordnet_lite import lite_syns

        caps = load_factual_captions(
            "/root/reference/data/factual_train.txt")
        deltas = []
        for i in range(150):
            p = caps[i * 5][1].lower()
            r = caps[i * 5 + 1][1].lower()
            b, _ = base_and_ub(p, r)
            deltas.append(meteor_score(p, r, synonyms=lite_syns) - b)
        mean_delta = sum(deltas) / len(deltas)
        assert 0.0 <= mean_delta < 0.03

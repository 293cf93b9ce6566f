"""Quantify METEOR's missing WordNet-synonym stage (BASELINE.md row).

This image ships no WordNet corpus, so captionax's METEOR runs
exact+stem matching only (the reference's HF metric always has WordNet,
/root/reference/utils.py:261-263).  This benchmark bounds the deviation
on REAL caption text — pairs of same-image captions from
data/factual_train.txt, the hardest realistic case (same content,
different wording):

- ``base``  — exact+stem only (captionax default here);
- ``lite``  — + the curated caption-domain synonym table
  (captionax.eval.wordnet_lite), a realistic estimate of synonym
  matches WordNet would add;
- ``ub``    — the mathematical upper bound: every word still unmatched
  after exact+stem counts as a synonym match with zero fragmentation
  penalty.  True WordNet lies in [base, ub], in practice near ``lite``
  (most unmatched words are different CONTENT, not synonyms).

    python benchmarks/meteor_wordnet_delta.py [n_pairs]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from captionax.data.flickr import load_factual_captions
from captionax.eval.meteor import _STEM, _count_chunks, _match_stage, meteor_score
from captionax.eval.wordnet_lite import lite_syns


def base_and_ub(pred, ref, alpha=0.9, beta=3.0, gamma=0.5):
    hw, rw = pred.split(), ref.split()
    hyp, refl = list(enumerate(hw)), list(enumerate(rw))
    matches, hyp, refl = _match_stage(hyp, refl, lambda w: w)
    sm, hyp, refl = _match_stage(hyp, refl, _STEM)
    matches += sm
    m = len(matches)

    def fmean(mm):
        if mm == 0:
            return 0.0
        p, r = mm / len(hw), mm / len(rw)
        return p * r / (alpha * p + (1 - alpha) * r)

    base = 0.0
    if m:
        frag = _count_chunks(matches) / m
        base = (1 - gamma * frag ** beta) * fmean(m)
    ub = fmean(m + min(len(hyp), len(refl)))
    return base, ub


def main(n_pairs: int = 400):
    caps = load_factual_captions("/root/reference/data/factual_train.txt")
    pairs = [(caps[i * 5][1].lower(), caps[i * 5 + 1][1].lower())
             for i in range(n_pairs)]
    base, lite, ub = [], [], []
    for p, r in pairs:
        b, u = base_and_ub(p, r)
        base.append(b)
        ub.append(u)
        lite.append(meteor_score(p, r, synonyms=lite_syns))
    base, lite, ub = map(np.asarray, (base, lite, ub))
    print(json.dumps({
        "metric": "meteor_wordnet_stage_delta",
        "n_pairs": n_pairs,
        "corpus_base_exact_stem": float(base.mean()),
        "corpus_with_lite_synonyms": float(lite.mean()),
        "lite_delta": float((lite - base).mean()),
        "upper_bound_all_synonyms": float(ub.mean()),
        "pairs_changed_by_lite": int((lite > base + 1e-12).sum()),
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 400)

"""Combined FlickrStyle + Conceptual Captions training data.

Reference: /root/reference/data_loader_combine.py + train_hyper_combine.py.
``combine_collate_fn`` randomly picks Flickr-vs-CC per batch
(data_loader_combine.py:403-419); the Flickr styles join the domain
dictionary as extra pseudo-domains ('f', 'h', 'r',
train_hyper_combine.py:63-84), so one hypernet conditions on ~100 web
domains plus the three styles.
"""

from __future__ import annotations

import random
from typing import Dict, Iterable, List, Optional, Sequence

import numpy as np

FLICKR_PSEUDO_DOMAINS = {"factual": "f", "humour": "h", "romantic": "r"}


def style_histograms(flickr_data, vocab) -> Dict[str, np.ndarray]:
    """Word histograms of the three style corpora over [len(vocab)+1]
    (so histogram-scheme embedders can condition on the styles too)."""
    V = len(vocab)
    out = {}
    corpora = {
        "f": [cap for _, cap in flickr_data.factual],
        "h": flickr_data.humour,
        "r": flickr_data.romantic,
    }
    for name, captions in corpora.items():
        hist = np.zeros(V + 1)
        for cap in captions:
            for word in cap.split(" "):
                if word in vocab.w2i:
                    hist[vocab.w2i[word]] += 1
                else:
                    hist[V] += 1
        out[name] = hist
    return out


class CombinedData:
    """Batch mixer: each batch is entirely Flickr (one style) or entirely
    CC (one domain), chosen at random — the reference's collate pattern."""

    def __init__(self, flickr, cc, flickr_prob: float = 0.5):
        self.flickr = flickr
        self.cc = cc
        self.flickr_prob = flickr_prob

    @property
    def domains(self) -> List[str]:
        return list(self.cc.domains) + list(FLICKR_PSEUDO_DOMAINS.values())

    def batches(
        self,
        batch_size: int,
        seed: int = 0,
        flickr_indices: Optional[Sequence[int]] = None,
        cc_indices: Optional[Sequence[int]] = None,
        drop_remainder: bool = True,
    ) -> Iterable[dict]:
        """Yield unified batches: every batch carries a ``domain`` key
        (CC domain name or 'f'/'h'/'r').

        Each batch slot flips a ``flickr_prob`` coin for Flickr-vs-CC —
        the reference's combine_collate_fn draws
        ``random.choice(["CC", "Fliker"])`` PER BATCH
        (data_loader_combine.py:413-415), i.e. the two corpora
        contribute ~50/50 regardless of their sizes.  (Rounds 1-4
        mixed proportionally to dataset size instead; with 2k Flickr
        images against the 7.6k-row domain-oversampled CC corpus that
        fed the model ~4-17% Flickr batches and free-running decode
        collapsed to CC-style text under every conditioning —
        benchmarks/_parity/combine_sep_plain.json.)  The epoch length
        is the sum of both sides' batch counts; whichever side runs
        out of fresh batches is regenerated with a new seed (new
        caption/style draws), matching the reference's
        sample-with-replacement collate.

        ``drop_remainder=False`` (test/eval iteration) passes through to
        both sides: tail chunks keep their natural size instead of
        oversampling to ``batch_size`` — the CC side's 2-row-per-domain
        test split otherwise inflates 294 rows into 147 full batches of
        resampled duplicates (37k beam decodes at B=256)."""
        rng = random.Random(seed)

        def fl_gen():
            wrap = 0
            while True:
                for b in self.flickr.batches(
                    flickr_indices
                    if flickr_indices is not None
                    else range(len(self.flickr)),
                    batch_size, style="random", seed=seed + 7919 * wrap,
                    drop_remainder=drop_remainder,
                ):
                    b["domain"] = FLICKR_PSEUDO_DOMAINS[b["style"]]
                    yield b
                wrap += 1

        def cc_gen():
            wrap = 0
            while True:
                yield from self.cc.batches(batch_size, seed=seed + 7919 * wrap,
                                           indices=cc_indices,
                                           drop_remainder=drop_remainder)
                wrap += 1

        n_fl = len(list(self.flickr.batches(
            flickr_indices if flickr_indices is not None
            else range(len(self.flickr)), batch_size, style="random",
            seed=seed, with_images=False,
            drop_remainder=drop_remainder)))
        n_cc = len(list(self.cc.batches(batch_size, seed=seed,
                                        indices=cc_indices,
                                        with_images=False,
                                        drop_remainder=drop_remainder)))
        fl_it, cc_it = fl_gen(), cc_gen()
        for _ in range(n_fl + n_cc):
            if n_fl and (not n_cc or rng.random() < self.flickr_prob):
                yield next(fl_it)
            else:
                yield next(cc_it)

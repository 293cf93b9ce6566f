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
    ) -> Iterable[dict]:
        """Yield unified batches: every batch carries a ``domain`` key
        (CC domain name or 'f'/'h'/'r')."""
        rng = random.Random(seed)
        fl_iter = self.flickr.batches(
            flickr_indices
            if flickr_indices is not None
            else range(len(self.flickr)),
            batch_size, style="random", seed=seed,
        )
        cc_iter = self.cc.batches(batch_size, seed=seed, indices=cc_indices)
        fl_batches = list(fl_iter)
        cc_batches = list(cc_iter)
        for b in fl_batches:
            b["domain"] = FLICKR_PSEUDO_DOMAINS[b["style"]]
        order = [("fl", b) for b in fl_batches] + [("cc", b) for b in cc_batches]
        rng.shuffle(order)
        for _, b in order:
            yield b

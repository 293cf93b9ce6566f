"""Conceptual Captions data: domain-labelled captions + homogeneous batches.

File format (/root/reference/cc_dataloader.py:64-68):
``<id>.jpg␣␣␣␣␣<caption>␣␣␣␣␣<domain>`` — 5-space separated.

The reference enforces domain-homogeneous batches with a *stateful*
``__getitem__`` hack (the first item of a batch fixes the domain, the next
batch_size-1 lookups resample inside that domain's contiguous index range,
cc_dataloader.py:75-158).  Here that becomes a deterministic group-by-domain
batch sampler: shuffle within each domain, emit fixed-size single-domain
batches, shuffle batch order (SURVEY.md §7.2 step 7).

URL-streaming variant (/root/reference/conceptual_dataloader.py +
train_cc.py): rows are ``caption\\turl`` GCC TSV lines; the domain is the
registrable host name.  Image download happens in the caller (the
reference fetched inside training_step; here the loader thread does it,
with the same stock-photo fallback semantics available via callback).
"""

from __future__ import annotations

import random
import re
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

SEP = "     "  # five spaces


def load_cc_captions(path: str) -> List[Tuple[str, str, str]]:
    """[(image_name, caption, domain)] rows."""
    rows = []
    with open(path, "r") as f:
        for line in f:
            parts = line.rstrip("\n").split(SEP)
            if len(parts) >= 3:
                rows.append((parts[0], parts[1], parts[2].strip()))
    return rows


def domain_list(*paths: str) -> List[str]:
    """Unique domains in file order (utils.py get_domain_list, :354-368 —
    which keeps the trailing newline in keys; we strip, and strip when
    looking up)."""
    seen: Dict[str, None] = {}
    for path in paths:
        if not path:
            continue
        for _, _, dom in load_cc_captions(path):
            seen.setdefault(dom, None)
    return list(seen)


def domain_chunks(
    by_domain: Dict[str, Sequence[int]],
    batch_size: int,
    rng: random.Random,
    drop_remainder: bool = True,
    allowed: Optional[set] = None,
) -> List[Tuple[str, List[int]]]:
    """Shuffled domain-homogeneous index chunks (shared by the CC and
    URL-streaming loaders — they once diverged on this and silently
    under-trained).

    With ``drop_remainder`` (training), a domain's tail chunk is FILLED
    by resampling from the same domain instead of dropped — the
    reference's stateful sampler likewise resamples within the fixed
    domain to fill every batch (cc_dataloader.py:75-158), so domains
    smaller than ``batch_size`` still train (oversampled) rather than
    contributing zero batches."""
    all_batches: List[Tuple[str, List[int]]] = []
    for dom, idxs in by_domain.items():
        idxs = [i for i in idxs if allowed is None or i in allowed]
        rng.shuffle(idxs)
        for s in range(0, len(idxs), batch_size):
            chunk = idxs[s : s + batch_size]
            if len(chunk) < batch_size and drop_remainder:
                chunk = chunk + rng.choices(idxs, k=batch_size - len(chunk))
            all_batches.append((dom, chunk))
    rng.shuffle(all_batches)
    return all_batches


def extract_domain(url: str) -> str:
    """Registrable-domain extraction (tldextract equivalent for the
    URL-streaming loader, conceptual_dataloader.py:34-40)."""
    host = re.sub(r"^[a-z]+://", "", url).split("/")[0].split(":")[0]
    parts = host.split(".")
    if len(parts) >= 3 and parts[-2] in ("co", "com", "net", "org", "ac", "gov"):
        return parts[-3]
    if len(parts) >= 2:
        return parts[-2]
    return host


@dataclass
class ConceptualCaptionsData:
    """Domain-labelled captions with homogeneous-batch iteration."""

    rows: List[Tuple[str, str, str]]
    vocab: object
    image_loader: Optional[Callable[[str], np.ndarray]] = None
    max_len: int = 25
    image_hw: Tuple[int, int] = (224, 224)

    def __post_init__(self):
        self.by_domain: Dict[str, List[int]] = {}
        for i, (_, _, dom) in enumerate(self.rows):
            self.by_domain.setdefault(dom, []).append(i)
        from captionax.data.flickr import _make_fast_encoder

        self._fast = _make_fast_encoder(self.vocab)

    def __len__(self):
        return len(self.rows)

    @property
    def domains(self) -> List[str]:
        return list(self.by_domain)

    def _encode(self, caption: str) -> np.ndarray:
        if self._fast is not None:
            return self._fast.encode_batch([caption], self.max_len)[0]
        ids = self.vocab.encode(caption)[: self.max_len]
        arr = np.zeros((self.max_len,), np.int32)
        arr[: len(ids)] = ids
        return arr

    def image(self, index: int) -> np.ndarray:
        name = self.rows[index][0]
        img = self.image_loader(name)
        if img.ndim == 2:  # grayscale -> viridis LUT (reference quirk)
            from captionax.data.transforms import grayscale_to_viridis

            img = grayscale_to_viridis(img)
        if img.shape[:2] != self.image_hw:
            from captionax.data.transforms import host_resize

            img = host_resize(img, self.image_hw)
        return img

    def batches(
        self,
        batch_size: int,
        seed: int = 0,
        indices: Optional[Sequence[int]] = None,
        drop_remainder: bool = True,
        with_images: bool = True,
    ):
        """Domain-homogeneous batches: dict(images?, captions [B,T],
        lengths [B], domain str).  Tail-chunk semantics: see
        :func:`domain_chunks`."""
        rng = random.Random(seed)
        allowed = set(indices) if indices is not None else None
        for dom, chunk in domain_chunks(self.by_domain, batch_size, rng,
                                        drop_remainder, allowed):
            caps = np.stack([self._encode(self.rows[i][1]) for i in chunk])
            out = {
                "captions": caps,
                "lengths": (caps != 0).sum(axis=1).astype(np.int32),
                "domain": dom,
                # dataset indices + namespace let the trainer cache
                # frozen-encoder features per image without cross-dataset
                # key collisions (train/harness.py FeatureCache)
                "indices": np.asarray(chunk, np.int64),
                "index_ns": "cc",
            }
            if with_images and self.image_loader is not None:
                out["images"] = np.stack([self.image(i) for i in chunk])
            yield out

    def split_by_domain(self, val_per_domain: int = 2, test_per_domain: int = 2,
                        seed: int = 0):
        """Per-domain val/test split (preprocess_cc.py semantics)."""
        rng = random.Random(seed)
        train, val, test = [], [], []
        for dom, idxs in self.by_domain.items():
            idxs = list(idxs)
            rng.shuffle(idxs)
            val.extend(idxs[:val_per_domain])
            test.extend(idxs[val_per_domain : val_per_domain + test_per_domain])
            train.extend(idxs[val_per_domain + test_per_domain :])
        return train, val, test

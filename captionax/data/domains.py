"""Domain-conditioning embeddings for the CC hypernet: the reference's six
interchangeable schemes (/root/reference/cc_train_hypernet.py:63-106,
utils.py:354-441).

Each scheme produces (a) a host-side ``dict domain -> vector-or-id`` built
at init time and (b) a trainable projection applied on device:

- ``one hot``          — domain id -> one-hot row, no trainable part;
  zero-shot domains get ids >= 100 (cc_train_hypernet.py:83-84);
- ``embedding``        — learned nn.Embedding(num_domains, hyper_emb);
- ``histograme``       — per-domain word-count histogram [V+1] -> MLP
  (V+1 -> 4h -> h, LeakyReLU after each);
- ``histograme log``   — log10(count + 1e-4) histogram -> same MLP;
- ``histograme tfidf`` — tf-idf weighted histogram -> same MLP (computed
  directly over the vocab-indexed histogram so the MLP input dim is
  consistent — the reference fed CountVectorizer vectors of a different
  dimensionality into the same MLP, which cannot run);
- ``JSD``              — pairwise Jensen-Shannon distance matrix of domain
  histograms -> t-SNE to n_tsne dims -> Linear(n_tsne, h) + LeakyReLU.
"""

from __future__ import annotations

import math
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from captionax.data.cc import load_cc_captions
from captionax.models.layers import mlp, mlp_init

SCHEMES = (
    "one hot", "embedding", "histograme", "histograme log",
    "histograme tfidf", "JSD",
)


def word_histograms(
    cap_path: str, vocab, domains: Sequence[str], log_scale: bool = False
) -> Dict[str, np.ndarray]:
    """Per-domain word-count histogram over [len(vocab)+1] (last slot =
    out-of-vocab), optional log10(x + 1e-4) (utils.py:371-392).  Caption
    words are split on spaces like the reference."""
    V = len(vocab)
    hists = {d: np.zeros(V + 1) for d in domains}
    for _, caption, dom in load_cc_captions(cap_path):
        if dom not in hists:
            continue
        for word in caption.split(" "):
            if word in vocab.w2i:
                hists[dom][vocab.w2i[word]] += 1
            else:
                hists[dom][V] += 1
    if log_scale:
        eps = 1e-4
        for d in hists:
            hists[d] = np.log10(hists[d] + eps)
    return hists


def tfidf_histograms(
    cap_path: str, vocab, domains: Sequence[str]
) -> Dict[str, np.ndarray]:
    """tf-idf over the vocab-indexed histograms (smooth idf, l2-normalized
    like sklearn's TfidfTransformer defaults)."""
    hists = word_histograms(cap_path, vocab, domains)
    mat = np.stack([hists[d] for d in domains])  # [D, V+1]
    n_docs = len(domains)
    df = (mat > 0).sum(axis=0)
    idf = np.log((1 + n_docs) / (1 + df)) + 1.0
    tfidf = mat * idf
    norms = np.linalg.norm(tfidf, axis=1, keepdims=True)
    tfidf = tfidf / np.maximum(norms, 1e-12)
    return {d: tfidf[i] for i, d in enumerate(domains)}


def jensen_shannon(p: np.ndarray, q: np.ndarray) -> float:
    """JS distance (sqrt of divergence, base e) matching
    scipy.spatial.distance.jensenshannon."""
    p = np.asarray(p, float)
    q = np.asarray(q, float)
    p_sum, q_sum = p.sum(), q.sum()
    if p_sum <= 0 or q_sum <= 0:
        return 0.0
    p, q = p / p_sum, q / q_sum
    m = (p + q) / 2

    def kl(a, b):
        mask = a > 0
        return float(np.sum(a[mask] * np.log(a[mask] / b[mask])))

    return math.sqrt(max(kl(p, m) / 2 + kl(q, m) / 2, 0.0))


def jsd_tsne_coords(
    cap_path: str,
    vocab,
    domains: Sequence[str],
    n_components: int = 2,
    zero_shot_path: str = "",
    zero_shot_domains: Sequence[str] = (),
    seed: int = 0,
) -> Dict[str, np.ndarray]:
    """Pairwise JSD matrix of domain histograms -> t-SNE coordinates
    (utils.py:423-441).  Falls back to classical MDS if sklearn is absent."""
    hists = word_histograms(cap_path, vocab, domains)
    if zero_shot_domains:
        hists.update(word_histograms(zero_shot_path, vocab, zero_shot_domains))
    names = list(hists)
    H = np.stack([hists[d] for d in names])
    D = len(names)
    dist = np.zeros((D, D))
    for i in range(D):
        for j in range(D):
            dist[i, j] = jensen_shannon(H[i], H[j])
    dist = np.nan_to_num(dist)
    try:
        from sklearn.manifold import TSNE

        coords = TSNE(
            n_components=n_components, init="random",
            random_state=seed, perplexity=min(30.0, max(2.0, (D - 1) / 3)),
        ).fit_transform(dist)
    except Exception:  # classical MDS fallback
        J = np.eye(D) - np.ones((D, D)) / D
        B = -0.5 * J @ (dist**2) @ J
        w, v = np.linalg.eigh(B)
        order = np.argsort(w)[::-1][:n_components]
        coords = v[:, order] * np.sqrt(np.maximum(w[order], 0))
    return {names[i]: coords[i].astype(np.float32) for i in range(D)}


class DomainEmbedder:
    """One object per scheme: host tables + (optional) trainable params.

    ``init_params(key)`` returns the trainable pytree (possibly empty);
    ``embed(params, domain)`` returns the hyper_emb-dim conditioning vector
    consumed by the hypernet, and ``hyper_emb`` its dimension.
    """

    def __init__(
        self,
        scheme: str,
        vocab,
        domains: Sequence[str],
        hyper_emb: int = 10,
        cap_path: str = "",
        n_tsne: int = 2,
        zero_shot_domains: Sequence[str] = (),
        zero_shot_path: str = "",
    ):
        assert scheme in SCHEMES, f"unknown scheme {scheme!r}"
        self.scheme = scheme
        self.vocab = vocab
        self.domains = [d.strip() for d in domains]
        self.zero_shot_domains = [d.strip() for d in zero_shot_domains]
        self.n_tsne = n_tsne
        self.table: Dict[str, object] = {}

        if scheme == "one hot":
            # ids: train domains 0..D-1; zero-shot j+100 (reference quirk)
            ids = {d: i for i, d in enumerate(self.domains)}
            ids.update({d: 100 + j for j, d in enumerate(self.zero_shot_domains)})
            self.table = ids
            self.hyper_emb = max(ids.values()) + 1 if ids else 0
        elif scheme == "embedding":
            ids = {d: i for i, d in enumerate(self.domains)}
            ids.update(
                {d: len(self.domains) + j for j, d in enumerate(self.zero_shot_domains)}
            )
            self.table = ids
            self.num_entries = len(ids)
            self.hyper_emb = hyper_emb
        elif scheme in ("histograme", "histograme log", "histograme tfidf"):
            if scheme == "histograme tfidf":
                hists = tfidf_histograms(cap_path, vocab, self.domains)
                if self.zero_shot_domains:
                    hists.update(
                        tfidf_histograms(zero_shot_path, vocab, self.zero_shot_domains)
                    )
            else:
                log_scale = scheme == "histograme log"
                hists = word_histograms(cap_path, vocab, self.domains, log_scale)
                if self.zero_shot_domains:
                    hists.update(
                        word_histograms(
                            zero_shot_path, vocab, self.zero_shot_domains, log_scale
                        )
                    )
            self.table = {d: np.asarray(v, np.float32) for d, v in hists.items()}
            self.hyper_emb = hyper_emb
        elif scheme == "JSD":
            self.table = jsd_tsne_coords(
                cap_path, vocab, self.domains, n_tsne,
                zero_shot_path, self.zero_shot_domains,
            )
            self.hyper_emb = hyper_emb

    def init_params(self, key):
        if self.scheme == "one hot":
            return {}
        if self.scheme == "embedding":
            return {"table": jax.random.normal(key, (self.num_entries, self.hyper_emb))}
        if self.scheme == "JSD":
            return mlp_init(key, (self.n_tsne, self.hyper_emb))
        # histogram MLP: V+1 -> 4h -> h with LeakyReLU after each
        return mlp_init(
            key, (len(self.vocab) + 1, 4 * self.hyper_emb, self.hyper_emb)
        )

    def host_vector(self, domain: str):
        return self.table[domain.strip()]

    def register_zero_shot(self, params, domains, key):
        """Register genuinely-unseen domains AFTER params were restored.

        Train/test compatibility rule: a tester must construct the
        embedder exactly as the trainer did (same domain list, same
        appended pseudo-styles) or the restored pytree shapes mismatch
        (the 'embedding' table is (num_entries, hyper_emb); the
        'one hot' width feeds the hypernet input dim).  Domains the
        trainer never saw are added here instead, post-restore:

        - 'embedding': appends fresh random rows — semantically the
          untrained-random-row a train-time append leaves behind
          (rows of never-batched domains receive zero gradient, the
          zero-shot semantics of /root/reference/test_zero_shot.py);
        - 'one hot': host-side ids only; ids beyond the trained
          hyper_emb width one-hot to the zero vector (documented
          degenerate conditioning — the reference never combined the
          one-hot scheme with post-hoc domains);
        - histogram/JSD schemes need no registration: their params are
          domain-count-independent MLPs, so zero-shot domains can (and
          should) be passed at construction as before.

        Returns the (possibly grown) ``params`` pytree; mutates the
        host-side id table in place.
        """
        new = [d.strip() for d in domains
               if d.strip() and d.strip() not in self.table]
        if not new:
            return params
        if self.scheme == "one hot":
            base = 100 + len(self.zero_shot_domains)
            for j, d in enumerate(new):
                self.table[d] = base + j
            self.zero_shot_domains += new
            return params
        if self.scheme == "embedding":
            for j, d in enumerate(new):
                self.table[d] = self.num_entries + j
            self.num_entries += len(new)
            self.zero_shot_domains += new
            rows = jax.random.normal(key, (len(new), self.hyper_emb))
            params = dict(params)
            params["table"] = jnp.concatenate(
                [jnp.asarray(params["table"]), rows])
            return params
        raise ValueError(
            f"scheme {self.scheme!r} embeds arbitrary domains already; "
            "pass them at construction via zero_shot_domains")

    def embed(self, params, domain_value) -> jnp.ndarray:
        """domain_value = host_vector(domain) placed on device (an id for
        one-hot/embedding schemes, a vector otherwise)."""
        if self.scheme == "one hot":
            return jax.nn.one_hot(domain_value, self.hyper_emb)
        if self.scheme == "embedding":
            return params["table"][domain_value]
        return mlp(params, jnp.asarray(domain_value), final_act=True)

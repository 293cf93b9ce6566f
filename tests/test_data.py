"""Data pipeline tests on the REAL reference caption files."""

import os

import numpy as np
import pytest

import jax

from captionax.data.cc import (
    ConceptualCaptionsData,
    domain_list,
    extract_domain,
    load_cc_captions,
)
from captionax.data.domains import DomainEmbedder, jensen_shannon
from captionax.data.flickr import FlickrStyleData, load_factual_captions
from captionax.data.loader import BatchLoader
from captionax.data.synthetic import synthetic_flickr_style
from captionax.data.transforms import preprocess_images

FACTUAL = "/root/reference/data/factual_train.txt"
CC = "/root/reference/data/200_conceptual_train.txt"

needs_ref = pytest.mark.skipif(
    not os.path.exists(FACTUAL), reason="reference data not mounted"
)


class TestFlickrParsing:
    @needs_ref
    def test_factual_file(self):
        rows = load_factual_captions(FACTUAL)
        assert len(rows) == 35000  # 7k images x 5 captions
        name, cap = rows[0]
        assert name.endswith(".jpg") and len(cap.split()) > 3

    @needs_ref
    def test_dataset_with_real_captions(self, ref_vocab):
        rows = load_factual_captions(FACTUAL)
        data = synthetic_flickr_style(
            num_images=16, vocab=ref_vocab,
            factual_lines=[c for _, c in rows[:200]],
        )
        batches = list(
            data.batches(range(16), batch_size=8, style="factual", seed=1)
        )
        assert len(batches) == 2
        b = batches[0]
        assert b["captions"].shape == (8, 25)
        assert b["images"].shape == (8, 224, 224, 3)
        assert b["style_id"] == 4

    def test_style_id_quirk(self):
        data = synthetic_flickr_style(num_images=4)
        # the reference collate names it 'humour'; vocab has 'humorous',
        # so the style id falls to <unk>=3 — preserved behavior
        assert data.style_id("humour") == 3
        assert data.style_id("factual") == 4
        assert data.style_id("romantic") == 6

    def test_random_style_batches_cover_styles(self):
        data = synthetic_flickr_style(num_images=32)
        styles = {
            b["style"]
            for b in data.batches(range(32), 4, style="random", seed=3)
        }
        assert len(styles) >= 2

    def test_splits_disjoint(self):
        data = synthetic_flickr_style(num_images=50)
        tr, va, te = data.splits(seed=0)
        assert len(tr) == 40 and len(va) == 5 and len(te) == 5
        assert not (set(tr) & set(va)) and not (set(va) & set(te))


class TestCC:
    @needs_ref
    def test_parse_and_domains(self):
        rows = load_cc_captions(CC)
        assert len(rows) > 1000
        doms = domain_list(CC)
        assert len(doms) > 10
        assert all(len(r) == 3 for r in rows[:5])

    @needs_ref
    def test_homogeneous_batches(self, ref_vocab):
        data = ConceptualCaptionsData(
            load_cc_captions(CC)[:2000], ref_vocab, image_loader=None
        )
        for b in data.batches(batch_size=8, with_images=False):
            assert b["captions"].shape == (8, 25)
            # batch is single-domain by construction
            assert isinstance(b["domain"], str)

    @needs_ref
    def test_split_by_domain(self, ref_vocab):
        data = ConceptualCaptionsData(
            load_cc_captions(CC)[:3000], ref_vocab, image_loader=None
        )
        tr, va, te = data.split_by_domain(2, 2)
        assert len(tr) + len(va) + len(te) == len(data)
        assert not (set(tr) & set(va))

    def test_extract_domain(self):
        assert extract_domain("https://www.alamy.com/foo.jpg") == "alamy"
        assert extract_domain("http://img.thesun.co.uk/x.jpg") == "thesun"

    @needs_ref
    def test_batch_larger_than_domain_fills_by_resampling(self, ref_vocab):
        """batch_size above every domain's size must still yield full
        homogeneous batches (reference resamples within the domain,
        cc_dataloader.py:75-158) — a silent zero-batch epoch regressed
        this once."""
        data = ConceptualCaptionsData(
            load_cc_captions(CC)[:500], ref_vocab, image_loader=None
        )
        biggest = max(len(v) for v in data.by_domain.values())
        bs = biggest + 37
        batches = list(data.batches(batch_size=bs, with_images=False))
        assert batches, "no batches despite drop_remainder fill"
        for b in batches:
            assert b["captions"].shape[0] == bs
            dom_rows = {data.rows[i][2] for i in b["indices"]}
            assert dom_rows == {b["domain"]}
        # every domain still represented
        assert {b["domain"] for b in batches} == set(data.by_domain)


class TestCombinedMixing:
    def _combined(self):
        from captionax.core.vocab import build_vocab
        from captionax.data.combine import CombinedData
        from captionax.data.synthetic import synthetic_flickr_style

        v = build_vocab(["a b c"] * 5, [["x y"] * 5])
        fl = synthetic_flickr_style(num_images=16, vocab=v, max_len=8)
        rows = [(f"{d}_{i}.jpg", f"cap {i}", f"dom{d}")
                for d in range(6) for i in range(12)]
        cc = ConceptualCaptionsData(rows, v, image_loader=None, max_len=8)
        return CombinedData(fl, cc)

    def test_fifty_fifty_per_batch(self):
        """The reference's combine_collate_fn draws
        random.choice(["CC", "Fliker"]) PER BATCH
        (data_loader_combine.py:413-415) — corpora contribute ~50/50
        regardless of size.  Proportional-to-size mixing regressed the
        combined model's conditioning (combine_sep_plain.json: 4-17%
        Flickr batches -> free-running decode collapsed to CC text)."""
        cd = self._combined()
        doms = [b["domain"] for b in cd.batches(4, seed=0)]
        n_fl = sum(d in ("f", "h", "r") for d in doms)
        # binomial(len, 0.5): bound generously, reject degenerate mixes
        assert 0.25 <= n_fl / len(doms) <= 0.75, (n_fl, len(doms))
        # deterministic for a given seed (val loaders replay exactly)
        assert [b["domain"] for b in cd.batches(4, seed=0)] == doms
        assert [b["domain"] for b in cd.batches(4, seed=1)] != doms

    def test_oversampled_side_regenerates(self):
        """When one side runs out of fresh batches mid-epoch it is
        regenerated with a new seed (new caption draws), mirroring the
        reference's sample-with-replacement collate."""
        cd = self._combined()
        cd.flickr_prob = 0.9  # force flickr wrap-around
        bs = [b for b in cd.batches(4, seed=3)
              if b["domain"] in ("f", "h", "r")]
        assert len(bs) > 4  # wrapped past the 4 natural flickr batches


class TestDomainEmbedders:
    @needs_ref
    @pytest.mark.parametrize(
        "scheme", ["one hot", "embedding", "histograme", "histograme log",
                   "histograme tfidf", "JSD"]
    )
    def test_all_schemes(self, ref_vocab, scheme):
        doms = domain_list(CC)[:12]
        emb = DomainEmbedder(
            scheme, ref_vocab, doms, hyper_emb=10, cap_path=CC, n_tsne=2
        )
        params = emb.init_params(jax.random.PRNGKey(0))
        vec = emb.embed(params, emb.host_vector(doms[0]))
        assert vec.shape == (emb.hyper_emb,)
        assert bool(np.isfinite(np.asarray(vec)).all())

    @needs_ref
    def test_one_hot_zero_shot_ids(self, ref_vocab):
        doms = domain_list(CC)[:5]
        emb = DomainEmbedder(
            "one hot", ref_vocab, doms, cap_path=CC,
            zero_shot_domains=["unseen-a", "unseen-b"],
        )
        assert emb.table["unseen-a"] == 100 and emb.table["unseen-b"] == 101
        assert emb.hyper_emb == 102  # reference quirk: ids >= 100

    def test_jensen_shannon_vs_scipy(self):
        scipy_dist = pytest.importorskip("scipy.spatial.distance")
        p = np.array([1.0, 2.0, 3.0, 0.0])
        q = np.array([2.0, 1.0, 1.0, 1.0])
        assert jensen_shannon(p, q) == pytest.approx(
            float(scipy_dist.jensenshannon(p, q)), rel=1e-9
        )


class TestPipeline:
    def test_preprocess_images_device(self):
        imgs = np.random.RandomState(0).randint(
            0, 255, (2, 224, 224, 3), dtype=np.uint8
        )
        out = np.asarray(preprocess_images(imgs))
        assert out.shape == (2, 224, 224, 3)
        assert abs(out.mean()) < 3.0  # normalized scale

    def test_batch_loader_prefetch(self):
        data = synthetic_flickr_style(num_images=16)
        loader = BatchLoader(
            data.batches(range(16), 4, style="factual"), prefetch=2
        )
        batches = list(loader)
        assert len(batches) == 4
        assert hasattr(batches[0]["captions"], "devices")  # on device

    def test_batch_loader_propagates_errors(self):
        def bad_gen():
            yield {"captions": np.zeros((2, 4), np.int32)}
            raise RuntimeError("boom")

        with pytest.raises(RuntimeError, match="boom"):
            list(BatchLoader(bad_gen(), prefetch=1))


class TestStyledFixture:
    """The deterministic styled-caption fixture that stands in for the
    dangling FlickrStyle humor/romantic files (SURVEY.md §2.9)."""

    def test_fixture_lines_aligned_and_distinct(self, ref_vocab):
        from captionax.data.synthetic import styled_caption_fixture

        factual = load_factual_captions("/root/reference/data/factual_train.txt")
        firsts = [factual[i * 5][1] for i in range(50)]
        hum, rom = styled_caption_fixture(firsts, ref_vocab)
        assert len(hum) == len(rom) == 50
        # style lines share the factual prefix but end differently
        diff = sum(h != r for h, r in zip(hum, rom))
        assert diff == 50
        for h, f in zip(hum, firsts):
            assert h.startswith(" ".join(f.lower().split()[:3]))
        # deterministic
        hum2, _ = styled_caption_fixture(firsts, ref_vocab)
        assert hum == hum2

    def test_fixture_fully_encodable(self, ref_vocab):
        """Every fixture token must map to a real vocab id (no <unk>),
        otherwise the style signal collapses into the unk embedding."""
        from captionax.data.synthetic import (
            _HUMOUR_FIXTURE_TAILS,
            _ROMANTIC_FIXTURE_TAILS,
            _known_tails,
        )

        for pool in (_HUMOUR_FIXTURE_TAILS, _ROMANTIC_FIXTURE_TAILS):
            known = _known_tails(pool, ref_vocab)
            assert len(known) >= 6, f"too few in-vocab tails: {known}"
            for t in known:
                for w in t.split():
                    assert w in ref_vocab.w2i

    def test_synthetic_dataset_uses_fixture(self, ref_vocab):
        factual = load_factual_captions("/root/reference/data/factual_train.txt")
        data = synthetic_flickr_style(
            num_images=8, vocab=ref_vocab,
            factual_lines=[c for _, c in factual[:80]],
            styled_fixture=True,
        )
        assert len(data.humour) == len(data.romantic) == 8
        # styled ids differ from factual ids for the same image
        fac = data.caption_ids("factual", 0, pick=0)
        hum = data.caption_ids("humour", 0)
        assert not np.array_equal(fac, hum)

    def test_styles_are_classifier_separable(self, ref_vocab):
        """A few Adam steps of the small style classifier must separate
        humour from romantic fixture lines far above chance — the
        measurable style-separation signal the flagship run reports."""
        import jax.numpy as jnp
        import optax

        from captionax.models.classifiers import (
            small_style_classifier_apply,
            small_style_classifier_init,
        )

        factual = load_factual_captions("/root/reference/data/factual_train.txt")
        data = synthetic_flickr_style(
            num_images=200, vocab=ref_vocab,
            factual_lines=[c for _, c in factual[:1000]],
            styled_fixture=True,
        )
        ids = np.stack(
            [data.caption_ids("humour", i) for i in range(160)]
            + [data.caption_ids("romantic", i) for i in range(160)]
        )
        labels = np.array([1] * 160 + [2] * 160)
        test_ids = np.stack(
            [data.caption_ids("humour", i) for i in range(160, 200)]
            + [data.caption_ids("romantic", i) for i in range(160, 200)]
        )
        test_labels = np.array([1] * 40 + [2] * 40)

        params = small_style_classifier_init(
            jax.random.PRNGKey(0), len(ref_vocab), 32
        )
        tx = optax.adam(1e-2)
        opt = tx.init(params)

        @jax.jit
        def step(params, opt, ids, labels):
            def loss_fn(p):
                probs = small_style_classifier_apply(p, ids)
                return -jnp.mean(
                    jnp.log(probs[jnp.arange(len(labels)), labels] + 1e-9)
                )

            loss, g = jax.value_and_grad(loss_fn)(params)
            updates, opt = tx.update(g, opt)
            return optax.apply_updates(params, updates), opt, loss

        for _ in range(60):
            params, opt, loss = step(params, opt, ids, labels)
        probs = np.asarray(small_style_classifier_apply(params, test_ids))
        acc = (probs.argmax(-1) == test_labels).mean()
        assert acc >= 0.9, f"style separation too weak: acc={acc}"

"""CC domain-hypernet zero-shot flow, end-to-end on CPU at tiny dims:
train on seen domains -> checkpoint -> rebuild with zero-shot domains
appended -> restore -> beam-test unseen domains."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from captionax.core.config import TrainConfig
from captionax.data.cc import SEP, ConceptualCaptionsData, domain_list, load_cc_captions
from captionax.data.domains import DomainEmbedder
from captionax.models import decoder as dec
from captionax.models.hypernet import hypernet_init
from captionax.train.harness import CaptionTrainer
from tests.test_harness import FakeVocab

NF, F, E, H, V = 24, 12, 12, 12, 37


@pytest.fixture()
def cc_files(tmp_path):
    train = tmp_path / "cc_train.txt"
    oneshot = tmp_path / "cc_oneshot.txt"
    rows = []
    for d in ("siteA", "siteB", "siteC"):
        for i in range(12):
            rows.append(SEP.join((f"{d}_{i}.jpg", f"w{3 + i % 20} w{5} w{7}", d)))
    train.write_text("\n".join(rows) + "\n")
    rows = []
    for d in ("unseenX", "unseenY"):
        for i in range(6):
            rows.append(SEP.join((f"{d}_{i}.jpg", f"w{9} w{4 + i % 10}", d)))
    oneshot.write_text("\n".join(rows) + "\n")
    return str(train), str(oneshot)


def make_model(embedder, key):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "decoder": dec.attention_gru_init(k1, NF, F, E, H, V),
        "hn": hypernet_init(k2, hyper_emb=embedder.hyper_emb,
                            input_dim=E + F, hidden_dim=H),
        "domain_emb": embedder.init_params(k3),
    }


def feature_batches(data, embedder, batch_size=4):
    rng = np.random.RandomState(0)
    for b in data.batches(batch_size, seed=0, with_images=False,
                          drop_remainder=False):
        b["features"] = rng.randn(len(b["captions"]), 9, NF).astype(np.float32)
        b["domain_value"] = np.asarray(embedder.host_vector(b["domain"]))
        yield b


class TestZeroShotFlow:
    def test_train_checkpoint_zero_shot(self, cc_files, tmp_path):
        train_path, oneshot_path = cc_files
        vocab = FakeVocab(V)
        vocab.encode = lambda text, add_bos_eos=True: (
            [1] + [min(3 + len(w), V - 1) for w in text.split()] + [2]
        )
        seen = domain_list(train_path)
        zs = domain_list(oneshot_path)

        # train-phase embedder: seen domains only
        emb_train = DomainEmbedder("one hot", vocab, seen, cap_path=train_path,
                                   zero_shot_domains=zs)
        embed_fn = lambda p, b: emb_train.embed(p["domain_emb"], b["domain_value"])  # noqa: E731
        params = make_model(emb_train, jax.random.PRNGKey(0))
        cfg = TrainConfig(max_epochs=1, batch_size=4, lr=1e-3,
                          checkpoint_dir=str(tmp_path), beam_max_steps=8)
        trainer = CaptionTrainer(params, "hypernet", cfg, vocab,
                                 embed_fn=embed_fn, run_name="zs")
        data = ConceptualCaptionsData(load_cc_captions(train_path), vocab)
        hist = trainer.fit(
            lambda epoch: feature_batches(data, emb_train),
            lambda: feature_batches(data, emb_train),
        )
        assert np.isfinite(hist[0]["train_loss_epoch"])

        # zero-shot phase: same one-hot table places unseen domains at
        # ids >= 100 (reference quirk); restore the checkpoint and beam
        trainer2 = CaptionTrainer(
            make_model(emb_train, jax.random.PRNGKey(1)), "hypernet", cfg,
            vocab, embed_fn=embed_fn, run_name="zs2",
        )
        assert trainer2.maybe_resume()
        assert emb_train.table["unseenX"] == 100
        zdata = ConceptualCaptionsData(load_cc_captions(oneshot_path), vocab)
        res = trainer2.test_beam(feature_batches(zdata, emb_train))
        assert "beam_corpus_bleu1" in res
        assert np.isfinite(res["tf_bleu1"])

    def test_register_zero_shot_post_restore(self, cc_files):
        """test_all's compatibility rule: construct like the trainer
        (pseudo-styles only), restore, then register unseen domains
        (captionax/cli/test_all.py) — the embedding-scheme table grows
        by exactly the new rows, trained rows bit-intact."""
        train_path, oneshot_path = cc_files
        vocab = FakeVocab(V)
        seen = domain_list(train_path)
        zs = domain_list(oneshot_path)

        emb = DomainEmbedder("embedding", vocab, seen, hyper_emb=6,
                             cap_path=train_path,
                             zero_shot_domains=list("fhr"))
        params = emb.init_params(jax.random.PRNGKey(0))
        trained = np.asarray(params["table"])  # stands in for a restore
        assert trained.shape == (len(seen) + 3, 6)

        params2 = emb.register_zero_shot(params, zs, jax.random.PRNGKey(7))
        table2 = np.asarray(params2["table"])
        assert table2.shape == (len(seen) + 3 + len(zs), 6)
        np.testing.assert_array_equal(table2[: len(trained)], trained)
        assert emb.table["unseenX"] == len(seen) + 3
        vec = emb.embed(params2, np.asarray(emb.host_vector("unseenX")))
        assert np.isfinite(np.asarray(vec)).all()
        # idempotent: re-registering known domains is a no-op
        params3 = emb.register_zero_shot(params2, zs, jax.random.PRNGKey(8))
        assert np.asarray(params3["table"]).shape == table2.shape

    def test_register_zero_shot_one_hot_degenerate(self, cc_files):
        """One-hot scheme: post-hoc ids fall beyond the trained width and
        one-hot to the zero vector (documented degenerate conditioning)."""
        train_path, oneshot_path = cc_files
        vocab = FakeVocab(V)
        seen = domain_list(train_path)
        zs = domain_list(oneshot_path)
        emb = DomainEmbedder("one hot", vocab, seen, cap_path=train_path,
                             zero_shot_domains=list("fhr"))
        width = emb.hyper_emb
        params = emb.init_params(jax.random.PRNGKey(0))
        params = emb.register_zero_shot(params, zs, jax.random.PRNGKey(1))
        assert emb.table["unseenX"] == 103  # after f/h/r at 100-102
        vec = np.asarray(emb.embed(params,
                                   np.asarray(emb.host_vector("unseenX"))))
        assert vec.shape == (width,) and (vec == 0).all()

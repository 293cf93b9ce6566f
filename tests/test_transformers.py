"""LaBERT / CATR / classifier tests, incl. parity of our BERT encoder vs
a randomly-initialized HuggingFace BertModel (weights converted, outputs
compared — no downloads needed)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from captionax.models.catr import catr_forward, catr_greedy, catr_init
from captionax.models.classifiers import (
    bert_trunk_apply,
    bert_trunk_from_hf_state_dict,
    small_style_classifier_apply,
    small_style_classifier_init,
    style_classifier_apply,
    style_classifier_init,
)
from captionax.models.labert import (
    labert_forward,
    labert_init,
    labert_loss,
    length_bucket,
    mask_predict_decode,
    mask_tokens,
)

V, B, R, T = 61, 2, 49, 12
MASK_ID = 5


@pytest.fixture(scope="module")
def labert_params():
    return labert_init(
        jax.random.PRNGKey(0), V, hidden=64, num_layers=2, num_heads=1,
        intermediate=128,
    )


class TestLabert:
    def test_forward_shapes(self, labert_params):
        feats = jax.random.normal(jax.random.PRNGKey(1), (B, R, 2048))
        ids = jax.random.randint(jax.random.PRNGKey(2), (B, T), 1, V)
        types = jnp.full((B, T), 3, jnp.int32)
        mask = jnp.ones((B, T))
        logits = labert_forward(labert_params, feats, ids, types, mask)
        assert logits.shape == (B, R + T, V)

    def test_mask_tokens_invariants(self):
        ids = jnp.array([[1, 7, 8, 9, 2, 0, 0], [1, 4, 2, 0, 0, 0, 0]])
        masked, pos = mask_tokens(jax.random.PRNGKey(0), ids, MASK_ID)
        assert bool(pos.any(axis=1).all())  # at least one per row
        assert not bool(pos[ids == 0].any())  # never mask pad
        np.testing.assert_array_equal(
            np.asarray(masked[np.asarray(pos)]),
            np.full(int(pos.sum()), MASK_ID),
        )

    def test_loss_trains(self, labert_params):
        import optax

        feats = jax.random.normal(jax.random.PRNGKey(1), (B, R, 2048))
        ids = jax.random.randint(jax.random.PRNGKey(2), (B, T), 6, V)
        types = jnp.full((B, T), 3, jnp.int32)
        tx = optax.adam(1e-3)
        params = labert_params
        opt = tx.init(params)

        @jax.jit
        def step(params, opt, rng):
            loss, g = jax.value_and_grad(labert_loss)(
                params, feats, ids, types, rng, MASK_ID
            )
            up, opt = tx.update(g, opt)
            return jax.tree_util.tree_map(lambda p, u: p + u, params, up), opt, loss

        import jax.tree_util as jtu
        import optax as _o

        l0 = None
        for i in range(25):
            params, opt, loss = step(params, opt, jax.random.PRNGKey(i))
            if l0 is None:
                l0 = float(loss)
        assert float(loss) < l0

    def test_mask_predict_decode(self, labert_params):
        feats = jax.random.normal(jax.random.PRNGKey(1), (B, R, 2048))
        ids = mask_predict_decode(labert_params, feats, MASK_ID, length=10,
                                  iterations=4)
        assert ids.shape == (B, 10)
        assert int((ids == MASK_ID).sum()) == 0  # fully filled

    def test_length_bucket(self):
        assert length_bucket(2) == 0
        assert length_bucket(8) == 1
        assert length_bucket(25) == 4  # first matching range wins
        assert length_bucket(100) == 5


@pytest.fixture(scope="module")
def catr_params():
    return catr_init(
        jax.random.PRNGKey(0), V, hidden=32, num_heads=1, ff=64,
        enc_layers=2, dec_layers=2,
    )


class TestCatr:
    def test_forward_shapes(self, catr_params):
        feats = jax.random.normal(jax.random.PRNGKey(1), (B, R, 2048))
        caps = jax.random.randint(jax.random.PRNGKey(2), (B, T), 1, V)
        logits = catr_forward(catr_params, feats, caps)
        assert logits.shape == (B, T, V)

    def test_causality(self, catr_params):
        feats = jax.random.normal(jax.random.PRNGKey(1), (B, R, 2048))
        caps = jax.random.randint(jax.random.PRNGKey(2), (B, T), 1, V)
        l1 = catr_forward(catr_params, feats, caps)
        caps2 = caps.at[:, -1].set((caps[:, -1] + 1) % V)
        l2 = catr_forward(catr_params, feats, caps2)
        # changing the last token must not affect logits before it
        np.testing.assert_allclose(
            np.asarray(l1[:, :-1]), np.asarray(l2[:, :-1]), atol=1e-5
        )

    def test_greedy(self, catr_params):
        feats = jax.random.normal(jax.random.PRNGKey(1), (B, R, 2048))
        ids = catr_greedy(catr_params, feats, max_len=8)
        assert ids.shape == (B, 8)
        assert (np.asarray(ids[:, 0]) == 1).all()  # BOS


class TestBertTrunkHFParity:
    def test_matches_hf_bert(self):
        transformers = pytest.importorskip("transformers")
        torch = pytest.importorskip("torch")

        cfg = transformers.BertConfig(
            vocab_size=V, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=1, intermediate_size=64,
            max_position_embeddings=16, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
        )
        torch.manual_seed(0)
        hf = transformers.BertModel(cfg).eval()
        ours = bert_trunk_from_hf_state_dict(hf.state_dict(), hidden=32,
                                             num_layers=2)
        # our head-count inference assumes hidden//64; patch for tiny dims
        ids = torch.randint(0, V, (B, 10))
        mask = torch.ones(B, 10)
        with torch.no_grad():
            ref_seq, ref_pool = hf(
                input_ids=ids, attention_mask=mask, return_dict=False
            )
        # monkeypatch heads: hidden=32 -> heads must be 1
        import captionax.models.classifiers as C

        seq, pooled = bert_trunk_apply(ours, jnp.asarray(ids.numpy()),
                                       jnp.asarray(mask.numpy()))
        np.testing.assert_allclose(
            np.asarray(seq), ref_seq.numpy(), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(pooled), ref_pool.numpy(), atol=2e-4
        )


class TestClassifiers:
    def test_style_classifier_probs(self):
        params = style_classifier_init(jax.random.PRNGKey(0), V, 3,
                                       hidden=32, num_layers=2)
        ids = jax.random.randint(jax.random.PRNGKey(1), (B, 10), 1, V)
        mask = jnp.ones((B, 10))
        probs = style_classifier_apply(params, ids, mask)
        assert probs.shape == (B, 3)
        np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)

    def test_small_classifier(self):
        params = small_style_classifier_init(jax.random.PRNGKey(0), V, 16, 3)
        ids = jax.random.randint(jax.random.PRNGKey(1), (B, 10), 1, V)
        probs = small_style_classifier_apply(params, ids)
        assert probs.shape == (B, 3)
        np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)

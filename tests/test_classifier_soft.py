"""Soft-token BERT classifier path: one-hot soft == hard apply, pytree
dispatch, and the style-aux step accepting a BERT probe (the reference's
mixup scores generated captions with the trained BertClassifer,
/root/reference/hypernet_attention.py:157-176)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from captionax.models.classifiers import (
    classifier_ids_apply_fn,
    classifier_soft_apply_fn,
    small_style_classifier_apply_soft,
    style_classifier_apply,
    style_classifier_apply_soft,
    style_classifier_init,
    small_style_classifier_init,
)

B, T, V, HID, L = 4, 9, 40, 32, 2


def tiny_bert_clf():
    return style_classifier_init(jax.random.PRNGKey(0), V, 3, HID, L)


class TestSoftBert:
    def test_onehot_soft_matches_hard(self):
        params = tiny_bert_clf()
        ids = jax.random.randint(jax.random.PRNGKey(1), (B, T), 1, V)
        hard = style_classifier_apply(params, ids, jnp.ones((B, T)))
        soft = style_classifier_apply_soft(
            params, jax.nn.one_hot(ids, V))
        np.testing.assert_allclose(np.asarray(soft), np.asarray(hard),
                                   atol=1e-5)

    def test_soft_is_differentiable(self):
        params = tiny_bert_clf()
        probs = jax.nn.softmax(
            jax.random.normal(jax.random.PRNGKey(2), (B, T, V)))

        def loss(p):
            pred = style_classifier_apply_soft(params, p)
            return -jnp.mean(jnp.log(pred[:, 0] + 1e-9))

        g = jax.grad(loss)(probs)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0

    def test_dispatch_on_pytree(self):
        bert = tiny_bert_clf()
        small = small_style_classifier_init(jax.random.PRNGKey(3), V, 16, 3)
        assert classifier_soft_apply_fn(bert) is style_classifier_apply_soft
        assert (classifier_soft_apply_fn(small)
                is small_style_classifier_apply_soft)
        ids = jax.random.randint(jax.random.PRNGKey(4), (B, T), 1, V)
        out_b = classifier_ids_apply_fn(bert)(bert, ids)
        out_s = classifier_ids_apply_fn(small)(small, ids)
        assert out_b.shape == out_s.shape == (B, 3)


class TestAuxStepWithBertProbe:
    def test_styleaux_step_trains_with_bert_classifier(self):
        from captionax.models import decoder as dec
        from captionax.models.hypernet import hypernet_init
        from captionax.train.state import create_train_state
        from captionax.train.steps import make_hypernet_styleaux_steps

        NF, FO, E, H = 24, 12, 12, 12
        k = jax.random.split(jax.random.PRNGKey(5), 3)
        params = {
            "decoder": dec.attention_gru_init(k[0], NF, FO, E, H, V),
            "hn": hypernet_init(k[1], hyper_emb=E, input_dim=E + FO,
                                hidden_dim=H, M=16),
        }
        clf = tiny_bert_clf()
        tx = optax.adam(1e-3)
        step = make_hypernet_styleaux_steps(tx, clf, style_ids=(4, 3, 6))
        state = create_train_state(params, tx)
        batch = {
            "features": jax.random.normal(k[2], (B, 5, NF)),
            "captions": jax.random.randint(jax.random.PRNGKey(6),
                                           (B, T), 0, V),
            "style_id": jnp.asarray(4, jnp.int32),
        }
        state2, metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(7))
        assert np.isfinite(float(metrics["train_loss"]))
        assert np.isfinite(float(metrics["style_loss"]))
        d = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()),
            state.params["hn"], state2.params["hn"])
        assert max(jax.tree_util.tree_leaves(d)) > 0

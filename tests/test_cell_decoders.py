"""Cell-level decoders (later.py family), non-attention hypernet, mixup."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from captionax.models.cell_decoders import (
    cell_decoder_forward,
    cell_decoder_infer,
    cell_decoder_init,
    show_attend_tell_forward,
    show_attend_tell_init,
    show_attend_tell_sample,
)
from captionax.models.hypernet import hypernet_apply, hypernet_init

E, H, V, B, T, R = 16, 16, 41, 3, 7, 9


class TestCellDecoders:
    @pytest.mark.parametrize("cell", ["gru", "lstm"])
    def test_forward_shapes(self, cell):
        params = cell_decoder_init(jax.random.PRNGKey(0), E, H, V, cell=cell)
        feats = jax.random.normal(jax.random.PRNGKey(1), (B, E))
        caps = jax.random.randint(jax.random.PRNGKey(2), (B, T), 1, V)
        logits = cell_decoder_forward(params, feats, caps, cell=cell)
        assert logits.shape == (B, T, V)

    def test_feature_is_first_input(self):
        """t=0 output must depend on the feature, not on captions."""
        params = cell_decoder_init(jax.random.PRNGKey(0), E, H, V)
        f1 = jax.random.normal(jax.random.PRNGKey(1), (B, E))
        c1 = jax.random.randint(jax.random.PRNGKey(2), (B, T), 1, V)
        c2 = jax.random.randint(jax.random.PRNGKey(3), (B, T), 1, V)
        l1 = cell_decoder_forward(params, f1, c1)
        l2 = cell_decoder_forward(params, f1, c2)
        np.testing.assert_allclose(
            np.asarray(l1[:, 0]), np.asarray(l2[:, 0]), atol=1e-6
        )

    def test_no_tf_samples_differ_by_key(self):
        params = cell_decoder_init(jax.random.PRNGKey(0), E, H, V)
        feats = jax.random.normal(jax.random.PRNGKey(1), (B, E))
        caps = jax.random.randint(jax.random.PRNGKey(2), (B, T), 1, V)
        l1 = cell_decoder_forward(params, feats, caps, teacher_forcing=False,
                                  rng=jax.random.PRNGKey(5))
        l2 = cell_decoder_forward(params, feats, caps, teacher_forcing=False,
                                  rng=jax.random.PRNGKey(6))
        assert not np.allclose(np.asarray(l1), np.asarray(l2))

    def test_infer(self):
        params = cell_decoder_init(jax.random.PRNGKey(0), E, H, V)
        feats = jax.random.normal(jax.random.PRNGKey(1), (B, E))
        ids = cell_decoder_infer(params, feats, max_len=10)
        assert ids.shape == (B, 10)

    def test_hypernet_theta_drives_cell(self):
        """Non-attention hypernet: theta with input_dim == E."""
        params = cell_decoder_init(jax.random.PRNGKey(0), E, H, V)
        hn = hypernet_init(jax.random.PRNGKey(1), hyper_emb=E, input_dim=E,
                           hidden_dim=H)
        theta = hypernet_apply(hn, jnp.ones((E,)))
        assert theta["w_ih"].shape == (3 * H, E)
        feats = jax.random.normal(jax.random.PRNGKey(2), (B, E))
        caps = jax.random.randint(jax.random.PRNGKey(3), (B, T), 1, V)
        l1 = cell_decoder_forward(params, feats, caps)
        l2 = cell_decoder_forward(params, feats, caps, cell_params=theta)
        assert not np.allclose(np.asarray(l1), np.asarray(l2))

    def test_lstm_hypernet_gates(self):
        hn = hypernet_init(jax.random.PRNGKey(1), hyper_emb=E, input_dim=E,
                           hidden_dim=H, gates=4)
        theta = hypernet_apply(hn, jnp.ones((E,)))
        assert theta["w_ih"].shape == (4 * H, E)
        assert theta["w_hh"].shape == (4 * H, H)


class TestShowAttendTell:
    def test_forward_and_sample(self):
        params = show_attend_tell_init(jax.random.PRNGKey(0), 32, E, H, H, V)
        enc = jax.random.normal(jax.random.PRNGKey(1), (B, R, 32))
        caps = jax.random.randint(jax.random.PRNGKey(2), (B, T), 1, V)
        logits, alphas = show_attend_tell_forward(params, enc, caps)
        assert logits.shape == (B, T - 1, V)
        assert alphas.shape == (B, T - 1, R)
        np.testing.assert_allclose(
            np.asarray(alphas.sum(-1)), 1.0, atol=1e-5
        )
        ids = show_attend_tell_sample(params, enc, max_len=8)
        assert ids.shape == (B, 8)


class TestMixupStep:
    def test_trains_and_logs_both_losses(self):
        import optax

        from captionax.models import decoder as dec
        from captionax.models.classifiers import small_style_classifier_init
        from captionax.train.state import create_train_state, make_optimizer
        from captionax.train.steps import make_hypernet_mixup_steps

        NF, F = 24, 12
        model = {
            "decoder": dec.attention_gru_init(jax.random.PRNGKey(0), NF, F, E, H, V),
            "hn": hypernet_init(jax.random.PRNGKey(1), hyper_emb=E,
                                input_dim=E + F, hidden_dim=H),
        }
        clf = small_style_classifier_init(jax.random.PRNGKey(2), V, E, 3)
        tx = make_optimizer(1e-3)
        state = create_train_state(model, tx)
        step = jax.jit(make_hypernet_mixup_steps(tx, clf, style_ids=(4, 3, 6)))
        batch = {
            "features": jax.random.normal(jax.random.PRNGKey(3), (B, R, NF)),
            "captions": jax.random.randint(jax.random.PRNGKey(4), (B, T), 1, V),
            "style_id": jnp.asarray(4, jnp.int32),
        }
        losses = []
        for i in range(15):
            state, m = step(state, batch, jax.random.PRNGKey(i))
            losses.append(float(m["train_loss"]))
            assert np.isfinite(float(m["style_loss"]))
            assert np.isfinite(float(m["ce_loss"]))
        assert losses[-1] < losses[0]

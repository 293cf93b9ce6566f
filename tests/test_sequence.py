"""Sequence + expert parallelism (parallel/sequence.py) on the virtual
8-device CPU mesh: the seq-sharded BERT encoder (all-gather and ring
schedules) must match the dense encoder — forward, through jax.grad,
under padding and causal masks, composed with data parallelism, and
plugged into labert_loss; expert-sharded theta synthesis must match
synthesize_theta_batched exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from captionax.models import transformer as tfm
from captionax.parallel.sequence import (
    expert_theta_bank,
    sequence_mesh,
    sequence_parallel_bert_encoder,
)

HEADS, DIM, FF, L, B, T = 4, 32, 64, 4, 8, 16


@pytest.fixture(scope="module")
def layers():
    return tfm.bert_encoder_init(jax.random.PRNGKey(0), L, DIM, HEADS, FF)


@pytest.fixture(scope="module")
def x():
    return jax.random.normal(jax.random.PRNGKey(1), (B, T, DIM))


@pytest.fixture(scope="module")
def pad_mask():
    # last 3 tokens of every other row padded out
    keep = np.ones((B, T), np.float32)
    keep[::2, -3:] = 0.0
    return (1.0 - jnp.asarray(keep))[:, None, None, :] * -10000.0


class TestSequenceParallel:
    @pytest.mark.parametrize("ring", [False, True])
    def test_matches_dense(self, layers, x, pad_mask, ring):
        dense = tfm.bert_encoder(layers, x, HEADS, pad_mask)
        mesh = sequence_mesh(n_seq=4)
        enc = sequence_parallel_bert_encoder(mesh, HEADS, ring=ring)
        out = jax.jit(lambda xx: enc(layers, xx, HEADS, pad_mask))(x)
        np.testing.assert_allclose(out, dense, atol=2e-5, rtol=2e-5)

    @pytest.mark.parametrize("ring", [False, True])
    def test_causal_mask(self, layers, x, ring):
        mask = tfm.causal_mask(T)  # [1, 1, T, T] — full query axis
        dense = tfm.bert_encoder(layers, x, HEADS, mask)
        mesh = sequence_mesh(n_seq=4)
        enc = sequence_parallel_bert_encoder(mesh, HEADS, ring=ring)
        out = jax.jit(lambda xx: enc(layers, xx, HEADS, mask))(x)
        np.testing.assert_allclose(out, dense, atol=2e-5, rtol=2e-5)

    @pytest.mark.parametrize("ring", [False, True])
    def test_grad_matches_dense(self, layers, x, pad_mask, ring):
        mesh = sequence_mesh(n_seq=4)
        enc = sequence_parallel_bert_encoder(mesh, HEADS, ring=ring)
        tgt = jax.random.normal(jax.random.PRNGKey(2), (B, T, DIM))

        def loss(ps, encoder):
            y = encoder(ps, x, HEADS, pad_mask)
            return jnp.mean((y - tgt) ** 2)

        g_dense = jax.grad(loss)(layers, tfm.bert_encoder)
        g_sp = jax.jit(jax.grad(loss), static_argnums=1)(layers, enc)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                a, b, atol=5e-5, rtol=5e-4
            ),
            g_dense, g_sp,
        )

    def test_composes_with_data_axis(self, layers, x, pad_mask):
        dense = tfm.bert_encoder(layers, x, HEADS, pad_mask)
        mesh = sequence_mesh(n_seq=4, n_data=2)
        enc = sequence_parallel_bert_encoder(mesh, HEADS, data_axis="data")
        out = jax.jit(lambda xx: enc(layers, xx, HEADS, pad_mask))(x)
        np.testing.assert_allclose(out, dense, atol=2e-5, rtol=2e-5)

    @pytest.mark.parametrize("ring", [False, True])
    def test_mask_none(self, layers, x, ring):
        # bert_encoder's mask is Optional — the drop-in must accept None
        dense = tfm.bert_encoder(layers, x, HEADS, None)
        mesh = sequence_mesh(n_seq=4)
        enc = sequence_parallel_bert_encoder(mesh, HEADS, ring=ring)
        out = jax.jit(lambda xx: enc(layers, xx, HEADS, None))(x)
        np.testing.assert_allclose(out, dense, atol=2e-5, rtol=2e-5)

    def test_indivisible_token_axis_raises(self, layers, pad_mask):
        mesh = sequence_mesh(n_seq=4)
        enc = sequence_parallel_bert_encoder(mesh, HEADS)
        bad = jnp.zeros((B, T + 2, DIM))
        with pytest.raises(ValueError, match="not divisible"):
            enc(layers, bad, HEADS, pad_mask)

    def test_labert_forward_matches(self):
        """End-to-end hook: labert_forward with the sp encoder_fn equals
        the sequential stack (4 image + 12 text = 16 tokens, seq=4) —
        including padded-out text columns."""
        from captionax.models import labert

        params = labert.labert_init(
            jax.random.PRNGKey(0), vocab_size=64, hidden=32,
            num_layers=4, num_heads=4, intermediate=64,
            max_position=32, num_regions=4, image_dim=16,
        )
        Bq, R, Ttxt = 4, 4, 12
        feats = jax.random.normal(jax.random.PRNGKey(4), (Bq, R, 16))
        ids = jax.random.randint(jax.random.PRNGKey(5), (Bq, Ttxt), 0, 64)
        types = jnp.zeros((Bq, Ttxt), jnp.int32)
        amask = jnp.ones((Bq, Ttxt)).at[:, -2:].set(0.0)  # padded tail
        ref = labert.labert_forward(
            params, feats, ids, types, amask, num_heads=4
        )
        mesh = sequence_mesh(n_seq=4)
        enc = sequence_parallel_bert_encoder(mesh, 4)
        out = jax.jit(
            lambda p: labert.labert_forward(
                p, feats, ids, types, amask, num_heads=4, encoder_fn=enc
            )
        )(params)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
        )


class TestExpertParallel:
    def test_bank_matches_batched_synthesis(self):
        from captionax.models.hypernet import hypernet_init
        from captionax.train.steps import synthesize_theta_batched

        hn = hypernet_init(
            jax.random.PRNGKey(0), hyper_emb=16, input_dim=24,
            hidden_dim=24,
        )
        params = {"hn": hn}
        embeds = jax.random.normal(jax.random.PRNGKey(1), (8, 16))
        ref = jax.jit(synthesize_theta_batched)(params, embeds)

        mesh = sequence_mesh(n_seq=4, seq_axis="expert")
        synth = expert_theta_bank(mesh, "expert")
        bank = jax.jit(synth)(params, embeds)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
            ref, bank,
        )

    def test_indivisible_bank_raises(self):
        from captionax.models.hypernet import hypernet_init

        params = {"hn": hypernet_init(
            jax.random.PRNGKey(0), hyper_emb=16, input_dim=24,
            hidden_dim=24,
        )}
        mesh = sequence_mesh(n_seq=4, seq_axis="expert")
        synth = expert_theta_bank(mesh, "expert")
        with pytest.raises(ValueError, match="not divisible"):
            synth(params, jnp.zeros((6, 16)))

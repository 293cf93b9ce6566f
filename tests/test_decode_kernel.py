"""Fused Pallas decode-kernel parity vs the scan implementations
(interpret mode on CPU; the real-TPU path is exercised by bench.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from captionax.decode import beam_search, greedy
from captionax.models import decoder as dec
from captionax.ops.decode_kernel import (
    _vocab_chunk,
    fused_beam_search,
    fused_greedy,
)

NF, F, E, H, V, B, R = 64, 24, 24, 24, 301, 6, 9


def make(seed, eos_bias):
    params = dec.attention_gru_init(jax.random.PRNGKey(seed), NF, F, E, H, V)
    params["fc"]["b"] = params["fc"]["b"].at[2].add(eos_bias)
    raw = jax.random.normal(jax.random.PRNGKey(seed + 100), (B, R, NF))
    return params, raw


class TestVocabChunk:
    def test_divides_and_aligned(self):
        for vp in (9728, 384, 2560, 128 * 76):
            c = _vocab_chunk(vp)
            assert vp % c == 0 and c % 128 == 0 and c <= max(2560, vp)


@pytest.mark.parametrize("seed,bias", [(5, 0.35), (7, 0.45), (11, 0.3)])
class TestFusedParity:
    def test_greedy(self, seed, bias):
        params, raw = make(seed, bias)
        ref = np.asarray(greedy(params, raw, max_len=20))
        got = np.asarray(
            fused_greedy(params, raw, max_len=20, block_rows=8,
                         interpret=True, f32=True)
        )
        np.testing.assert_array_equal(got, ref)

    def test_beam(self, seed, bias):
        params, raw = make(seed, bias)
        ref = beam_search(params, raw, k=3, max_steps=25)
        got = fused_beam_search(params, raw, max_steps=25, block_images=8,
                                interpret=True, f32=True)
        np.testing.assert_array_equal(np.asarray(got.found), np.asarray(ref.found))
        np.testing.assert_array_equal(
            np.asarray(got.lengths), np.asarray(ref.lengths)
        )
        np.testing.assert_array_equal(
            np.asarray(got.tokens), np.asarray(ref.tokens)
        )
        np.testing.assert_allclose(
            np.asarray(got.scores), np.asarray(ref.scores), atol=3e-3
        )


class TestHypernetTheta:
    def test_beam_with_synthesized_weights(self):
        from captionax.models.hypernet import hypernet_apply, hypernet_init

        params, raw = make(3, 0.4)
        hn = hypernet_init(jax.random.PRNGKey(9), hyper_emb=E,
                           input_dim=E + F, hidden_dim=H)
        theta = hypernet_apply(hn, jnp.ones((E,)) * 0.1)
        ref = beam_search(params, raw, k=3, max_steps=20, gru_params=theta)
        got = fused_beam_search(params, raw, gru_params=theta, max_steps=20,
                                block_images=8, interpret=True, f32=True)
        np.testing.assert_array_equal(
            np.asarray(got.tokens), np.asarray(ref.tokens)
        )

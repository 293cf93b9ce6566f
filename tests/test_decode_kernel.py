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


class TestTop3Unit:
    """_top3/_first_argmax directly (outside pallas) on crafted matrices:
    must reproduce jax.lax.top_k exactly, including first-occurrence
    ordering of duplicated values."""

    def _check(self, x):
        from captionax.ops.decode_kernel import _first_argmax, _top3

        ref_v, ref_i = jax.lax.top_k(x, 3)
        # both schemes (flat = default since r5; segmented kept for the
        # profiling A/B) must match lax.top_k bit-for-bit incl. ties
        for seg in (False, True):
            v3, i3 = _top3(x, seg=seg)
            np.testing.assert_array_equal(np.asarray(i3), np.asarray(ref_i))
            np.testing.assert_allclose(np.asarray(v3), np.asarray(ref_v))
        i1 = _first_argmax(x, axis=1)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(ref_i[:, 0]))

    def test_random(self):
        self._check(jax.random.normal(jax.random.PRNGKey(0), (8, 1024)))

    def test_ties(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (8, 1024))
        # same top value planted three times: first occurrences win, in
        # index order
        x = x.at[:, 700].set(50.0).at[:, 90].set(50.0).at[:, 95].set(50.0)
        self._check(x)
        y = jnp.zeros((4, 1024)).at[:, [130, 5, 600, 900]].set(7.0)
        self._check(y)

    def test_all_equal(self):
        self._check(jnp.zeros((4, 768)))


class TestLargeVocabTies:
    """Kernel parity at a vocab spanning several 128-lane chunks-worth of
    logits (vp=768; the V=301 cases above cover the small case), with
    exact first-occurrence ordering under forced logit ties: duplicated
    fc columns produce identical logits in different lane regions."""

    DIMS = dict(nf=32, f=16, e=16, h=16, v=650)  # vp=768 -> 6 groups

    def _make(self, seed, batch=4, regions=5, tie=False):
        d = self.DIMS
        params = dec.attention_gru_init(
            jax.random.PRNGKey(seed), d["nf"], d["f"], d["e"], d["h"], d["v"]
        )
        params["fc"]["b"] = params["fc"]["b"].at[2].add(0.4)
        if tie:
            # duplicate an fc column into a different 128-lane group and
            # boost both so the tied pair reaches the top-3: the kernel
            # must rank index 10 before 500 (first occurrence)
            fc = params["fc"]
            params["fc"] = {
                "w": fc["w"].at[:, 500].set(fc["w"][:, 10]),
                "b": fc["b"].at[500].set(fc["b"][10] + 3.0).at[10].add(3.0),
            }
        raw = jax.random.normal(
            jax.random.PRNGKey(seed + 100), (batch, regions, d["nf"])
        )
        return params, raw

    @pytest.mark.parametrize("tie", [False, True])
    def test_beam(self, tie):
        params, raw = self._make(21, tie=tie)
        ref = beam_search(params, raw, k=3, max_steps=15)
        got = fused_beam_search(params, raw, max_steps=15, block_images=4,
                                interpret=True, f32=True)
        np.testing.assert_array_equal(
            np.asarray(got.tokens), np.asarray(ref.tokens)
        )
        np.testing.assert_array_equal(
            np.asarray(got.lengths), np.asarray(ref.lengths)
        )

    @pytest.mark.parametrize("tie", [False, True])
    def test_greedy(self, tie):
        params, raw = self._make(23, tie=tie)
        ref = np.asarray(greedy(params, raw, max_len=15))
        got = np.asarray(
            fused_greedy(params, raw, max_len=15, block_rows=8,
                         interpret=True, f32=True)
        )
        np.testing.assert_array_equal(got, ref)
        if tie:
            assert (ref == 10).any()


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


class TestMixedStyleBeam:
    """Theta-bank kernel: mixed-style batches decode in one launch and
    must match both the per-image scan beam and per-style homogeneous
    kernel calls exactly."""

    def _make(self):
        from captionax.models.hypernet import hypernet_init
        from captionax.train.steps import synthesize_theta_batched

        k = jax.random.split(jax.random.PRNGKey(31), 3)
        params, raw = make(31, 0.6)
        hn = hypernet_init(k[0], hyper_emb=E, input_dim=E + F, hidden_dim=H)
        model = {"decoder": params, "hn": hn}
        style_embeds = params["embed"][jnp.array([4, 3, 6])]
        thetas = synthesize_theta_batched(model, style_embeds)
        style_rows = jnp.array([0, 1, 2, 2, 1, 0], jnp.int32)
        return params, raw, thetas, style_rows

    def test_matches_per_image_scan_beam(self):
        params, raw, thetas, style_rows = self._make()
        got = fused_beam_search(
            params, raw, gru_params=thetas, max_steps=8, block_images=2,
            interpret=True, f32=True, style_rows=style_rows,
        )
        theta_img = jax.tree_util.tree_map(lambda t: t[style_rows], thetas)
        ref = beam_search(params, raw, k=3, max_steps=8, gru_params=theta_img)
        np.testing.assert_array_equal(
            np.asarray(got.tokens), np.asarray(ref.tokens)
        )
        np.testing.assert_array_equal(
            np.asarray(got.found), np.asarray(ref.found)
        )
        np.testing.assert_array_equal(
            np.asarray(got.lengths), np.asarray(ref.lengths)
        )
        np.testing.assert_allclose(
            np.asarray(got.scores), np.asarray(ref.scores), rtol=1e-5
        )

    def test_matches_homogeneous_calls(self):
        params, raw, thetas, style_rows = self._make()
        got = fused_beam_search(
            params, raw, gru_params=thetas, max_steps=8, block_images=2,
            interpret=True, f32=True, style_rows=style_rows,
        )
        for s in range(3):
            idx = np.where(np.asarray(style_rows) == s)[0]
            ths = jax.tree_util.tree_map(lambda t: t[s], thetas)
            solo = fused_beam_search(
                params, raw[idx], gru_params=ths, max_steps=8,
                block_images=2, interpret=True, f32=True,
            )
            np.testing.assert_array_equal(
                np.asarray(got.tokens)[idx], np.asarray(solo.tokens)
            )

    def test_batched_theta_requires_style_rows(self):
        params, raw, thetas, _ = self._make()
        with pytest.raises(ValueError, match="style_rows"):
            fused_beam_search(
                params, raw, gru_params=thetas, max_steps=4,
                block_images=2, interpret=True, f32=True,
            )

    def test_greedy_mixed_style(self):
        from captionax.decode.search import greedy
        from captionax.ops.decode_kernel import fused_greedy

        params, raw, thetas, style_rows = self._make()
        got = fused_greedy(
            params, raw, gru_params=thetas, max_len=10, block_rows=3,
            interpret=True, f32=True, style_rows=style_rows,
        )
        theta_img = jax.tree_util.tree_map(lambda t: t[style_rows], thetas)
        ref = greedy(params, raw, max_len=10, gru_params=theta_img)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


class TestScanBeamBatchedThetaKeyOrder:
    def test_tree_map_rebuilt_theta_expands(self):
        """Regression: jax tree ops rebuild theta dicts key-sorted (b_hh
        first), so batched-theta detection must check w_ih by name."""
        from captionax.models.hypernet import hypernet_apply, hypernet_init

        params, raw = make(33, 0.5)
        hn = hypernet_init(jax.random.PRNGKey(11), hyper_emb=E,
                           input_dim=E + F, hidden_dim=H)
        theta = hypernet_apply(hn, jnp.ones((E,)) * 0.1)
        stacked = jax.tree_util.tree_map(
            lambda t: jnp.stack([t] * B), theta
        )  # key-sorted dict with leading [B]
        ref = beam_search(params, raw, k=3, max_steps=8, gru_params=theta)
        got = beam_search(params, raw, k=3, max_steps=8, gru_params=stacked)
        np.testing.assert_array_equal(
            np.asarray(got.tokens), np.asarray(ref.tokens)
        )

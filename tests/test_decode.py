"""Decode-path tests: greedy / sample / beam, including step-level parity of
beam search against a NumPy re-enactment of the reference's inline beam
(hypernet_attention.py:242-313)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from captionax.decode import beam_search, greedy, sample
from captionax.models import decoder as dec

B, R, NF, F, E, H, V = 2, 9, 16, 12, 12, 12, 23
END = 2


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(42)
    params = dec.attention_gru_init(key, NF, F, E, H, V)
    raw = jax.random.normal(jax.random.PRNGKey(7), (B, R, NF))
    return params, raw


def numpy_reference_beam(params, raw_feature, k=3, max_steps=50, end_id=END):
    """The reference test_step beam, re-enacted in NumPy for one image."""

    def lin(p, x):
        return x @ np.asarray(p["w"]) + np.asarray(p["b"])

    def attention(feats, h):
        a = np.tanh(lin(params["attention"]["W_a"], feats)
                    + lin(params["attention"]["U_a"], h)[:, None, :])
        s = lin(params["attention"]["v_a"], a)
        w = np.exp(s - s.max(axis=1, keepdims=True))
        w = w / w.sum(axis=1, keepdims=True)
        return (w * feats).sum(axis=1)

    def gru(x, h):
        g = params["gru"]
        gi = x @ np.asarray(g["w_ih"]).T + np.asarray(g["b_ih"])
        gh = h @ np.asarray(g["w_hh"]).T + np.asarray(g["b_hh"])
        hd = h.shape[-1]
        r = 1 / (1 + np.exp(-(gi[:, :hd] + gh[:, :hd])))
        z = 1 / (1 + np.exp(-(gi[:, hd:2*hd] + gh[:, hd:2*hd])))
        n = np.tanh(gi[:, 2*hd:] + r * gh[:, 2*hd:])
        return (1 - z) * n + z * h

    def log_softmax(x):
        x = x - x.max(axis=-1, keepdims=True)
        return x - np.log(np.exp(x).sum(axis=-1, keepdims=True))

    ff = params["feature_fc"]
    feats = lin(ff["l1"], np.maximum(lin(ff["l0"], raw_feature[None]), 0))
    feats = np.repeat(feats, k, axis=0)  # [k, R, F]
    embed_tab = np.asarray(params["embed"])

    h = lin(params["init_h"], feats.mean(axis=1))
    k_prev = np.zeros((k, 1), np.int64)
    seqs = k_prev.copy()
    top_k_scores = np.zeros((k, 1))
    complete_seqs, complete_scores = [], []
    step = 1
    while True:
        emb = embed_tab[k_prev[:, 0]]
        if k_prev[0][0] == 0:
            emb = np.zeros_like(emb)
        ctx = attention(feats, h)
        h = gru(np.concatenate([emb, ctx], axis=1), h)
        scores = log_softmax(lin(params["fc"], h))
        scores = top_k_scores + scores
        if step == 1:
            flat = scores[0]
            top_idx = np.argsort(-flat)[:k]
            top_sc = flat[top_idx]
            prev_idx = np.zeros(k, np.int64)
            next_tok = top_idx
        else:
            flat = scores.reshape(-1)
            top_idx = np.argsort(-flat)[:k]
            top_sc = flat[top_idx]
            prev_idx = top_idx // V
            next_tok = top_idx % V
        seqs = np.concatenate([seqs[prev_idx], next_tok[:, None]], axis=1)
        incomplete = [i for i, w in enumerate(next_tok) if w != end_id]
        complete = list(set(range(len(next_tok))) - set(incomplete))
        if complete:
            complete_seqs.extend(seqs[complete].tolist())
            complete_scores.extend(top_sc[complete].tolist())
        k -= len(complete)
        if k == 0:
            break
        seqs = seqs[incomplete]
        h = h[prev_idx[incomplete]]
        feats = feats[prev_idx[incomplete]]
        top_k_scores = top_sc[incomplete, None]
        k_prev = next_tok[incomplete, None]
        if step > max_steps:
            break
        step += 1
    if not complete_scores:
        return None, None
    best = int(np.argmax(complete_scores))
    return complete_seqs[best], complete_scores[best]


class TestBeamParity:
    def test_matches_reference_algorithm(self, setup):
        params, raw = setup
        # nudge </s> upward so completions happen within the horizon
        params = dict(params)
        params["fc"] = dict(params["fc"])
        params["fc"]["b"] = params["fc"]["b"].at[END].add(2.0)
        res = beam_search(params, raw, k=3, max_steps=50)
        found_any = False
        for b in range(B):
            ref_seq, ref_score = numpy_reference_beam(
                params, np.asarray(raw[b]), k=3
            )
            if ref_seq is None:
                assert not bool(res.found[b])
                continue
            found_any = True
            got = np.asarray(res.tokens[b])[: res.lengths[b]]
            assert bool(res.found[b])
            np.testing.assert_array_equal(got, ref_seq)
            assert np.isclose(float(res.scores[b]), ref_score, atol=1e-4)
        assert found_any, "no image completed — test vacuous"

    def test_found_flag_off_when_no_eos(self, setup):
        params, raw = setup
        # crush the </s> logit so no beam can ever complete
        params2 = jax.tree_util.tree_map(lambda x: x, params)
        params2["fc"] = dict(params["fc"])
        params2["fc"]["b"] = params["fc"]["b"].at[END].set(-1e9)
        res = beam_search(params2, raw, k=3, max_steps=10)
        assert not bool(res.found.any())


class TestGreedy:
    def test_shapes_and_determinism(self, setup):
        params, raw = setup
        t1 = greedy(params, raw, max_len=15)
        t2 = greedy(params, raw, max_len=15)
        assert t1.shape == (B, 15)
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))

    def test_matches_stepwise_numpy(self, setup):
        """Greedy must equal a per-step argmax loop (embedding of token 0
        NOT zeroed at t=0, matching reference greedy_search)."""
        params, raw = setup
        feats = dec.encode_features(params, raw)
        h = dec.init_hidden(params, feats)
        tok = jnp.zeros((B,), jnp.int32)
        outs = []
        done = np.zeros(B, bool)
        for _ in range(10):
            emb = jnp.take(params["embed"], tok, axis=0)
            h_new, logits, _ = dec.decode_step(params, emb, h, feats)
            nxt = np.asarray(jnp.argmax(logits, -1))
            emit = np.where(done, 0, nxt)
            outs.append(emit)
            keep = done
            done = done | (nxt == END)
            h = jnp.where(jnp.asarray(keep)[:, None], h, h_new)
            tok = jnp.where(jnp.asarray(keep), tok, nxt.astype(np.int32))
        expected = np.stack(outs, 1)
        got = np.asarray(greedy(params, raw, max_len=10))
        np.testing.assert_array_equal(got, expected)

    def test_pads_after_eos(self, setup):
        params, raw = setup
        toks = np.asarray(greedy(params, raw, max_len=30))
        for row in toks:
            hit = np.where(row == END)[0]
            if hit.size:
                assert (row[hit[0] + 1 :] == 0).all()


class TestSample:
    def test_deterministic_given_key(self, setup):
        params, raw = setup
        k = jax.random.PRNGKey(3)
        s1 = sample(params, raw, k, max_len=12)
        s2 = sample(params, raw, k, max_len=12)
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))

    def test_different_keys_differ(self, setup):
        params, raw = setup
        s1 = sample(params, raw, jax.random.PRNGKey(3), max_len=12)
        s2 = sample(params, raw, jax.random.PRNGKey(4), max_len=12)
        assert not np.array_equal(np.asarray(s1), np.asarray(s2))

    def test_topk_restricts_support(self, setup):
        params, raw = setup
        # with top_k=1 sampling degenerates to greedy
        s = sample(params, raw, jax.random.PRNGKey(0), max_len=10, top_k=1)
        g = greedy(params, raw, max_len=10)
        np.testing.assert_array_equal(np.asarray(s), np.asarray(g))

    def test_jit_compiles(self, setup):
        params, raw = setup
        f = jax.jit(lambda p, r: beam_search(p, r, k=3, max_steps=20))
        res = f(params, raw)
        assert res.tokens.shape == (B, 21)


class TestLstmGreedy:
    """lstm_greedy (AttentionLstm greedy_search,
    /root/reference/models/decoderlstm.py:264-285): start token 0 with
    its embedding NOT zeroed, argmax feedback, stop on </s>."""

    @pytest.fixture(scope="class")
    def lstm_setup(self):
        params = dec.attention_lstm_init(jax.random.PRNGKey(5), NF, E, H, V)
        raw = jax.random.normal(jax.random.PRNGKey(8), (B, R, NF))
        return params, raw

    def test_matches_stepwise_loop(self, lstm_setup):
        params, feats = lstm_setup
        hc = dec.lstm_init_hidden(params, feats)
        tok = jnp.zeros((B,), jnp.int32)
        alive = np.ones(B, bool)
        outs = []
        for _ in range(12):
            emb = jnp.take(params["embed"], tok, axis=0)
            hc, logits, _ = dec.lstm_decode_step(params, emb, hc, feats)
            nxt = np.asarray(jnp.argmax(logits, -1))
            outs.append(np.where(alive, nxt, 0))
            alive = alive & (nxt != END)
            tok = jnp.asarray(nxt, jnp.int32)
        expected = np.stack(outs, 1)
        got = np.asarray(dec.lstm_greedy(params, feats, max_len=12))
        np.testing.assert_array_equal(got, expected)

    def test_pads_after_eos(self, lstm_setup):
        params, feats = lstm_setup
        # bias the fc toward </s> so decodes terminate early
        params = dict(params)
        params["fc"] = {"w": params["fc"]["w"],
                        "b": params["fc"]["b"].at[END].add(4.0)}
        toks = np.asarray(dec.lstm_greedy(params, feats, max_len=20))
        for row in toks:
            hit = np.where(row == END)[0]
            assert hit.size, "biased decode should emit </s>"
            assert (row[hit[0] + 1:] == 0).all()

"""Token-level parity of captionax beam search vs the reference beam.

The reference's inference beam is the inline test_step loop
(/root/reference/hypernet_attention.py:242-313, k=3, cumulative
log-softmax scores, raw-score winner).  We rebuild that exact algorithm
here in raw torch as the oracle (same math as
benchmarks/torch_cpu_baseline.beam_decode, generalized dims), copy the
weights into a captionax pytree, and require the chosen token sequences
to be identical.

This pins down the "beam CIDEr << TF CIDEr" observation from round 1
(BASELINE.md): if the two implementations pick identical sequences, the
gap is a property of the model decoding freely, not a search bug.

Known deviations (documented, excluded from the equality domain):
- horizon off-by-one: the reference's ``if step > 50: break`` runs up to
  51 decode steps; captionax runs exactly ``max_steps``.  Tests keep
  completions inside the shared horizon.
- the reference zeroes the WHOLE beam embedding matrix whenever *beam
  0*'s previous token is <pad> (hypernet_attention.py:267-268) — after
  step 1 that only triggers if beam 0 emits <pad> mid-decode, which the
  topk can do since CE never constrains the pad logit.  captionax zeroes
  at t==0 only.  The mid-decode case is exercised separately below.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from captionax.decode.search import beam_search  # noqa: E402
from tests.test_decoder_parity import (  # noqa: E402
    build_torch_attention_gru,
    copy_params,
    t2j,
)

B, R, NF, F, E, H, V, T = 3, 49, 64, 20, 20, 20, 37, 7
K = 3
END_ID = 2


@torch.no_grad()
def reference_beam(m, raw_feature, k=K, max_steps=50, end_id=END_ID):
    """The reference test_step inline beam for ONE image
    (hypernet_attention.py:242-313 semantics).  Returns
    (tokens incl. leading 0, raw cumulative score, completed?)."""
    import torch.nn.functional as TF

    feats = m.ff2(torch.relu(m.ff1(raw_feature.unsqueeze(0))))
    feats = feats.expand(k, feats.shape[1], feats.shape[2])
    h = m.init_h(feats.mean(dim=1))
    k_prev = torch.zeros(k, 1, dtype=torch.long)
    seqs = k_prev
    top_k_scores = torch.zeros(k, 1)
    complete_seqs, complete_scores = [], []
    vocab_size = m.fc.out_features
    step = 1
    while True:
        emb = m.embed(k_prev).squeeze(1)
        if k_prev[0][0] == 0:  # the beam-0 pad quirk (:267-268)
            emb = torch.zeros_like(emb)
        a = torch.tanh(m.W_a(feats) + m.U_a(h).unsqueeze(1))
        w = torch.softmax(m.v_a(a), dim=1)
        ctx = (w * feats).sum(dim=1)
        h = m.gru(torch.cat([emb, ctx], dim=1), h)
        scores = TF.log_softmax(m.fc(h), dim=1)
        scores = top_k_scores.expand_as(scores) + scores
        if step == 1:
            top_sc, top_w = scores[0].topk(k, 0, True, True)
        else:
            top_sc, top_w = scores.view(-1).topk(k, 0, True, True)
        prev_idx = torch.div(top_w, vocab_size, rounding_mode="floor")
        next_tok = top_w % vocab_size
        seqs = torch.cat([seqs[prev_idx], next_tok.unsqueeze(1)], dim=1)
        incomplete = [i for i, wd in enumerate(next_tok) if wd != end_id]
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
        top_k_scores = top_sc[incomplete].unsqueeze(1)
        k_prev = next_tok[incomplete].unsqueeze(1)
        if step > max_steps:
            break
        step += 1
    if not complete_scores:
        return seqs[0].tolist(), None, False
    best = complete_scores.index(max(complete_scores))
    return complete_seqs[best], complete_scores[best], True


def make_model(seed, eos_bias=0.0, pad_bias=-10.0):
    torch.manual_seed(seed)
    m = build_torch_attention_gru()
    with torch.no_grad():
        # keep <pad> out of the top-k (see module docstring) and make
        # </s> reachable so beams complete inside the horizon
        m.fc.bias[0] += pad_bias
        m.fc.bias[END_ID] += eos_bias
    return m, copy_params(m)


class TestBeamOracleParity:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_completed_beams_token_identical(self, seed):
        """EOS-reachable weights: both implementations must pick the
        same winning sequence with the same cumulative score."""
        m, params = make_model(seed, eos_bias=2.5)
        torch.manual_seed(100 + seed)
        raw = torch.randn(B, R, NF)
        res = beam_search(params, t2j(raw), k=K, max_steps=20, end_id=END_ID)
        found = np.asarray(res.found)
        toks = np.asarray(res.tokens)
        lens = np.asarray(res.lengths)
        scores = np.asarray(res.scores)
        n_checked = 0
        for i in range(B):
            ref_seq, ref_score, ref_found = reference_beam(
                m, raw[i], max_steps=19
            )
            assert bool(found[i]) == ref_found
            if not ref_found:
                continue
            got = toks[i][: lens[i]].tolist()
            assert got == ref_seq, f"image {i}: {got} != {ref_seq}"
            assert abs(scores[i] - ref_score) < 1e-3
            n_checked += 1
        assert n_checked > 0, "no beam completed; raise eos_bias"

    def test_no_completion_found_flag(self):
        """EOS suppressed: both sides report no completed beam (the
        reference returns the incomplete top beam; captionax sets
        found=False and the harness skips the image)."""
        m, params = make_model(7, eos_bias=-50.0)
        torch.manual_seed(7)
        raw = torch.randn(2, R, NF)
        res = beam_search(params, t2j(raw), k=K, max_steps=10, end_id=END_ID)
        for i in range(2):
            _, _, ref_found = reference_beam(m, raw[i], max_steps=9)
            assert not ref_found
            assert not bool(np.asarray(res.found)[i])

    def test_hypernet_theta_beam_parity(self):
        """Same check with hypernet-style external GRU weights (the
        gru_params hook): injected thetas must not break parity."""
        m, params = make_model(11, eos_bias=2.5)
        torch.manual_seed(42)
        with torch.no_grad():
            for p in m.gru.parameters():
                p.mul_(0.5).add_(torch.randn_like(p) * 0.1)
        theta = {
            "w_ih": t2j(m.gru.weight_ih),
            "w_hh": t2j(m.gru.weight_hh),
            "b_ih": t2j(m.gru.bias_ih),
            "b_hh": t2j(m.gru.bias_hh),
        }
        # captionax decodes with theta passed externally; zero the
        # pytree copy to prove the hook (not params["gru"]) is used
        params = dict(params)
        params["gru"] = {k: jnp.zeros_like(v) for k, v in theta.items()}
        torch.manual_seed(43)
        raw = torch.randn(B, R, NF)
        res = beam_search(
            params, t2j(raw), k=K, max_steps=20, end_id=END_ID,
            gru_params=theta,
        )
        found = np.asarray(res.found)
        toks = np.asarray(res.tokens)
        lens = np.asarray(res.lengths)
        n_checked = 0
        for i in range(B):
            ref_seq, _, ref_found = reference_beam(m, raw[i], max_steps=19)
            assert bool(found[i]) == ref_found
            if ref_found:
                assert toks[i][: lens[i]].tolist() == ref_seq
                n_checked += 1
        assert n_checked > 0

    def test_mid_decode_pad_divergence_is_characterized(self):
        """When <pad> CAN win beam slots (its logit is unconstrained by
        the reference's CE ignore_index), the reference zeroes all beam
        embeddings whenever beam 0 just emitted <pad> — captionax does
        not reproduce that quirk (documented deviation).  This test just
        asserts both searches still terminate and return well-formed
        output in that regime."""
        m, params = make_model(5, eos_bias=1.0, pad_bias=+4.0)
        torch.manual_seed(5)
        raw = torch.randn(2, R, NF)
        res = beam_search(params, t2j(raw), k=K, max_steps=15, end_id=END_ID)
        toks = np.asarray(res.tokens)
        assert toks.shape == (2, 16)
        for i in range(2):
            seq, _, _ = reference_beam(m, raw[i], max_steps=14)
            assert len(seq) <= 16

"""Inference-time decoding: greedy, multinomial sampling, and beam search.

All three are fixed-shape ``lax.scan`` programs over the attention-GRU
decode step, batched over images (and beams), so a whole eval set decodes
as one XLA computation — no Python-level token loops or beam list surgery.

This single beam implementation replaces the reference's five near-copies
(inline beams in hypernet_attention.py:242-313, train_attention_gru.py:159-252,
train_cc.py, cc_train_gru.py, plus models/decoderlstm.py:467-661 BeamSearch)
and preserves the ``test_step`` semantics that define parity:

- beams start from token 0 (<pad>) with a **zeroed** embedding at step 1
  (hypernet_attention.py:267-268);
- step 1 draws the top-k from beam 0 only (all beams identical);
- cumulative log-softmax scores, top-k over the flattened k*V candidates;
- a beam emitting </s> is recorded as complete and leaves contention;
- hard stop after ``max_steps`` (reference: step > 50);
- the winner is the completed sequence with the best **raw** cumulative
  score (test_step) or length-normalized score (BeamSearch class) —
  selectable via ``length_norm``.

The hypernet hook: pass ``gru_params`` (optionally per-image batched) and
the same programs decode with synthesized weights.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from captionax.models import decoder as dec
from captionax.models.layers import embedding

NEG_INF = -1e9


def _step_batched(params, word_embed, h, features, gru_params):
    """decode_step over a [B*K] flattened beam batch."""
    return dec.decode_step(params, word_embed, h, features, gru_params)


def greedy(
    params: Dict,
    raw_features: jnp.ndarray,
    max_len: int = 20,
    end_id: int = 2,
    gru_params: Optional[Dict] = None,
    features_encoded: bool = False,
) -> jnp.ndarray:
    """Batched greedy decode (reference greedy_search,
    models/decoderlstm.py:138-175: start token 0, embedding NOT zeroed).

    Returns token ids [B, max_len]; positions after </s> are <pad>.
    """
    features = raw_features if features_encoded else dec.encode_features(params, raw_features)
    B = features.shape[0]
    h = dec.init_hidden(params, features)
    tok0 = jnp.zeros((B,), jnp.int32)
    done0 = jnp.zeros((B,), bool)

    def body(carry, _):
        h, tok, done = carry
        word_embed = embedding(params["embed"], tok)
        h_new, logits, _ = dec.decode_step(params, word_embed, h, features, gru_params)
        nxt = jnp.argmax(jax.nn.log_softmax(logits, axis=-1), axis=-1).astype(jnp.int32)
        emit = jnp.where(done, 0, nxt)
        done_new = jnp.logical_or(done, nxt == end_id)
        h_keep = jnp.where(done[:, None], h, h_new)
        tok_next = jnp.where(done, tok, nxt)
        return (h_keep, tok_next, done_new), emit

    (_, _, _), toks = jax.lax.scan(body, (h, tok0, done0), None, length=max_len)
    return jnp.transpose(toks, (1, 0))


def sample(
    params: Dict,
    raw_features: jnp.ndarray,
    rng: jax.Array,
    max_len: int = 20,
    end_id: int = 2,
    temperature: float = 1.0,
    top_k: int = 0,
    gru_params: Optional[Dict] = None,
) -> jnp.ndarray:
    """Batched multinomial sampling (the no-TF training path of the
    reference's DecoderGRU, later.py:291-300; top_k>0 gives the
    sample_multinomial_topk behavior of utils.py:336-344)."""
    features = dec.encode_features(params, raw_features)
    B = features.shape[0]
    h = dec.init_hidden(params, features)
    tok0 = jnp.zeros((B,), jnp.int32)
    done0 = jnp.zeros((B,), bool)
    keys = jax.random.split(rng, max_len)

    def body(carry, key):
        h, tok, done = carry
        word_embed = embedding(params["embed"], tok)
        h_new, logits, _ = dec.decode_step(params, word_embed, h, features, gru_params)
        logits = logits / temperature
        if top_k > 0:
            vals, idx = jax.lax.top_k(logits, top_k)
            choice = jax.random.categorical(key, vals, axis=-1)
            nxt = jnp.take_along_axis(idx, choice[:, None], axis=1)[:, 0]
        else:
            nxt = jax.random.categorical(key, logits, axis=-1)
        nxt = nxt.astype(jnp.int32)
        emit = jnp.where(done, 0, nxt)
        done_new = jnp.logical_or(done, nxt == end_id)
        h_keep = jnp.where(done[:, None], h, h_new)
        tok_next = jnp.where(done, tok, nxt)
        return (h_keep, tok_next, done_new), emit

    (_, _, _), toks = jax.lax.scan(body, (h, tok0, done0), keys)
    return jnp.transpose(toks, (1, 0))


class BeamResult(NamedTuple):
    tokens: jnp.ndarray  # [B, max_steps + 1] incl. leading start token 0
    scores: jnp.ndarray  # [B] winning cumulative (or normalized) score
    found: jnp.ndarray   # [B] bool: did any beam complete (reference
    #                      `compute` flag, hypernet_attention.py:309-318)
    lengths: jnp.ndarray  # [B] token count of the winner incl. leading 0 + </s>


def beam_search(
    params: Dict,
    raw_features: jnp.ndarray,
    k: int = 3,
    max_steps: int = 50,
    end_id: int = 2,
    length_norm: bool = False,
    gru_params: Optional[Dict] = None,
) -> BeamResult:
    """Fixed-shape batched k-beam search over the attention-GRU decoder.

    raw_features: [B, R, num_features].  ``gru_params`` may be unbatched
    (shared weights) or have a leading [B] axis (per-image hypernet
    weights); beams of one image always share weights.
    """
    features = dec.encode_features(params, raw_features)  # [B, R, F]
    B, R, F = features.shape
    V = params["fc"]["b"].shape[0]
    H = params["init_h"]["b"].shape[0]
    T = max_steps + 1

    # expand over beams: [B, K, ...] flattened to [B*K, ...]
    feats_bk = jnp.broadcast_to(features[:, None], (B, k, R, F)).reshape(B * k, R, F)
    # NOTE: check w_ih by name — jax tree ops rebuild dicts key-sorted, so
    # the "first value" would be b_hh (ndim 2 even when theta is batched)
    if gru_params is not None and gru_params["w_ih"].ndim == 3:
        gru_bk = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[:, None], (B, k) + x.shape[1:]).reshape(
                (B * k,) + x.shape[1:]
            ),
            gru_params,
        )
    else:
        gru_bk = gru_params

    h0 = dec.init_hidden(params, feats_bk)  # [B*K, H]
    tokens0 = jnp.zeros((B, k, T), jnp.int32)
    # beam 0 starts at score 0; others at -inf so step 1 == reference's
    # "top-k from beam 0 only"
    scores0 = jnp.where(jnp.arange(k) == 0, 0.0, NEG_INF)[None].repeat(B, 0)
    prev_tok0 = jnp.zeros((B, k), jnp.int32)

    best_score0 = jnp.full((B,), NEG_INF)
    best_seq0 = jnp.zeros((B, T), jnp.int32)
    best_len0 = jnp.zeros((B,), jnp.int32)
    found0 = jnp.zeros((B,), bool)

    def cell_step(h, prev_tok, t):
        emb = embedding(params["embed"], prev_tok.reshape(B * k))
        emb = jnp.where(t == 0, jnp.zeros_like(emb), emb)  # zeroed step-1 embed
        h_new, logits, _ = _step_batched(params, emb, h, feats_bk, gru_bk)
        return h_new, jax.nn.log_softmax(logits, axis=-1).reshape(B, k, V)

    def body(carry, t):
        h, prev_tok, scores, tokens, best_score, best_seq, best_len, found = carry
        h_new, logp = cell_step(h, prev_tok, t)

        cand = scores[:, :, None] + logp  # [B, K, V]; dead beams stay -inf
        top_scores, top_idx = jax.lax.top_k(cand.reshape(B, k * V), k)
        prev_beam = top_idx // V  # [B, K]
        next_tok = (top_idx % V).astype(jnp.int32)

        # reorder histories and hidden states by parent beam
        gather = lambda x: jnp.take_along_axis(x, prev_beam[..., None], axis=1)
        tokens = jnp.take_along_axis(
            tokens, prev_beam[..., None].repeat(T, -1), axis=1
        )
        tokens = tokens.at[:, :, t + 1].set(next_tok)
        h_new = h_new.reshape(B, k, H)
        h_new = gather(h_new).reshape(B * k, H)

        # children of eliminated (-inf) beams are not real completions
        alive_parent = top_scores > NEG_INF / 2
        completed = jnp.logical_and(next_tok == end_id, alive_parent)  # [B, K]
        crit = top_scores / (t + 2.0) if length_norm else top_scores
        # best completed beam this step (scores are sorted desc, so the
        # first completed slot is the best completed candidate)
        cand_val = jnp.where(completed, crit, NEG_INF)
        best_slot = jnp.argmax(cand_val, axis=1)  # [B]
        slot_val = jnp.take_along_axis(cand_val, best_slot[:, None], 1)[:, 0]
        improve = slot_val > best_score
        best_score = jnp.where(improve, slot_val, best_score)
        best_seq = jnp.where(
            improve[:, None],
            jnp.take_along_axis(tokens, best_slot[:, None, None].repeat(T, -1), 1)[:, 0],
            best_seq,
        )
        best_len = jnp.where(improve, t + 2, best_len)
        found = jnp.logical_or(found, completed.any(axis=1))

        # completed beams leave contention
        scores = jnp.where(completed, NEG_INF, top_scores)
        return (h_new, next_tok, scores, tokens, best_score, best_seq, best_len, found), None

    carry0 = (h0, prev_tok0, scores0, tokens0, best_score0, best_seq0, best_len0, found0)
    (h, _, _, _, best_score, best_seq, best_len, found), _ = jax.lax.scan(
        body, carry0, jnp.arange(max_steps)
    )
    # zero out positions past the winner's length
    pos = jnp.arange(T)[None]
    best_seq = jnp.where(pos < best_len[:, None], best_seq, 0)
    return BeamResult(best_seq, best_score, found, best_len)

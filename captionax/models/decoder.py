"""Caption decoders: attention-GRU (the workhorse), attention-LSTM, and the
plain seq2seq LSTM — pure functions over weight pytrees with ``lax.scan``
time loops.

Replaces the reference's Python-level per-token loops
(/root/reference/models/decoderlstm.py:78-119 AttentionGru.forward,
:233-254 AttentionLstm.forward, :334-357 DecoderLstm.forward) with
fixed-shape scans that XLA compiles into a single TPU program.  Weight
layout matches torch so checkpoints import 1:1, and the GRU cell pytree is
exactly the tensor set the hypernetwork generates.

Reference quirks preserved for token-level parity (SURVEY.md §7.3):
- teacher-forced step t=0 consumes a **zeroed** embedding
  (decoderlstm.py:83-84) and step t>0 consumes embed(captions[:, t-1]);
- ``sample_prob`` is the probability of *sampling* (feeding back the
  argmax of the previous logits scaled by ``sample_temp=0.5``), drawn once
  per step for the whole batch (np.random.random() in the reference);
- extra GRU layers (num_layers>1) are applied as h = cell(h, h), including
  once on the initial hidden state (decoderlstm.py:63-66, 101-103).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from captionax.models.attention import bahdanau_attention, bahdanau_init
from captionax.models.layers import (
    embedding,
    embedding_init,
    linear,
    linear_init,
    mlp_init,
)
from captionax.models.rnn import (
    gru_cell,
    gru_cell_init,
    lstm_cell,
    lstm_cell_init,
)

Params = Dict[str, object]


# ====================================================== attention-GRU ====
def attention_gru_init(
    key,
    num_features: int,
    feature_out: int,
    embed_dim: int,
    hidden_dim: int,
    vocab_size: int,
    num_layers: int = 1,
    dtype=jnp.float32,
) -> Params:
    """Parameter pytree of the AttentionGru decoder
    (/root/reference/models/decoderlstm.py:11-47)."""
    keys = jax.random.split(key, 7 + max(0, num_layers - 1))
    params: Params = {
        "feature_fc": mlp_init(keys[0], (num_features, feature_out, feature_out), dtype),
        "embed": embedding_init(keys[1], vocab_size, embed_dim, dtype),
        "gru": gru_cell_init(keys[2], embed_dim + feature_out, hidden_dim, dtype),
        "fc": linear_init(keys[3], hidden_dim, vocab_size, dtype),
        "attention": bahdanau_init(keys[4], feature_out, hidden_dim),
        "init_h": linear_init(keys[5], feature_out, hidden_dim, dtype),
    }
    if num_layers > 1:
        params["layers"] = [
            gru_cell_init(keys[7 + i], hidden_dim, hidden_dim, dtype)
            for i in range(num_layers - 1)
        ]
    return params


def encode_features(params: Params, raw_features: jnp.ndarray) -> jnp.ndarray:
    """feature_fc MLP: Linear -> ReLU -> Linear (decoderlstm.py:22-26)."""
    ff = params["feature_fc"]
    x = jax.nn.relu(linear(ff["l0"], raw_features))
    return linear(ff["l1"], x)


def _attention_pre(att_params, att1, features, hidden):
    """bahdanau_attention with the loop-invariant ``att1 = W_a f`` term
    precomputed by the caller (identical math/op order otherwise)."""
    att2 = linear(att_params["U_a"], hidden)[:, None, :]
    scores = linear(att_params["v_a"], jnp.tanh(att1 + att2))
    weights = jax.nn.softmax(scores, axis=1)
    context = jnp.sum(weights * features, axis=1)
    return context, weights[..., 0]


def _extra_layers(params: Params, h: jnp.ndarray) -> jnp.ndarray:
    for cell in params.get("layers", ()):  # type: ignore[union-attr]
        h = gru_cell(cell, h, h)
    return h


def init_hidden(params: Params, features: jnp.ndarray) -> jnp.ndarray:
    """h0 = init_h(mean over regions), then extra layers once
    (decoderlstm.py:122-135, 63-66)."""
    h = linear(params["init_h"], jnp.mean(features, axis=1))
    return _extra_layers(params, h)


def decode_step(
    params: Params,
    word_embed: jnp.ndarray,
    h: jnp.ndarray,
    features: jnp.ndarray,
    gru_params: Optional[Dict] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One decode step: attention -> GRU -> (extra layers) -> fc.

    ``gru_params`` overrides params['gru'] — this is the hypernet hook.
    Returns (h_next, logits [B, V], attn_weights [B, R]).
    """
    cell = params["gru"] if gru_params is None else gru_params
    context, attn = bahdanau_attention(params["attention"], features, h)
    x = jnp.concatenate([word_embed, context], axis=-1)
    h = gru_cell(cell, x, h)
    h = _extra_layers(params, h)
    logits = linear(params["fc"], h)
    return h, logits, attn


def teacher_forced_hidden(
    params: Params,
    raw_features: jnp.ndarray,
    captions: jnp.ndarray,
    gru_params: Optional[Dict] = None,
    remat: bool = False,
    unroll: int = 1,
    hoist_att1: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The pure-teacher-forcing recurrence WITHOUT the vocab projection:
    -> (hs [B, T, H], attn [B, T, R]).

    ``unroll``: lax.scan unroll factor — the per-iteration matmuls are
    tiny ([B,E+F]x[E+F,3H]) so XLA's per-step loop overhead is a real
    cost; unrolling lets it pipeline/fuse across steps.

    Logits never feed back into the loop under pure TF, so the scan only
    carries the recurrence (attention + GRU, small matmuls); the V-sized
    projection is the caller's (one [B*T, H] x [H, V] GEMM in
    :func:`teacher_forced`, or the fused chunked CE in
    captionax.train.losses which never materializes [B*T, V]).

    ``remat=True`` checkpoints the scan body: backward saves only the
    [B, H] carry per step and recomputes the attention math (whose
    [B, R, H] residuals otherwise dominate the step's HBM traffic —
    measured ~11 ms of the 84 ms f32 train step at B=1024,
    benchmarks/train_ablate.py).  Numerics are identical.
    """
    features = encode_features(params, raw_features)
    h0 = init_hidden(params, features)
    embeds = embedding(params["embed"], captions)  # [B, T, E]
    B, T, E = embeds.shape
    zero_embed = jnp.zeros((B, E), embeds.dtype)
    cell = params["gru"] if gru_params is None else gru_params
    # hoist_att1=True moves the loop-invariant att1 = W_a f GEMM out of
    # the scan (1 GEMM instead of T, like the decode kernel's
    # _prep_features).  MEASURED NEGATIVE for TRAINING under remat
    # (benchmarks/trainstep_roofline.py, B=1024 bf16: 21.5 ms hoisted vs
    # 18.7 ms recomputed): the hoisted att1 is a 20 MB residual the
    # backward must stream + accumulate gradients into per step, while
    # the in-body recompute stays in VMEM and its weight gradient is a
    # tiny [F,H] matrix.  Default False (recompute); the flag remains
    # for the A/B.
    att1 = (linear(params["attention"]["W_a"], features)
            if hoist_att1 else None)

    def body(h, t):
        word_embed = jnp.where(
            t == 0, zero_embed, embeds[:, jnp.maximum(t - 1, 0)]
        )
        if hoist_att1:
            context, attn = _attention_pre(params["attention"], att1,
                                           features, h)
        else:  # A/B baseline: recompute W_a f inside every step
            context, attn = bahdanau_attention(params["attention"],
                                               features, h)
        x = jnp.concatenate([word_embed, context], axis=-1)
        h = gru_cell(cell, x, h)
        h = _extra_layers(params, h)
        return h, (h, attn)

    _, (hs, attn) = jax.lax.scan(
        jax.checkpoint(body) if remat else body, h0, jnp.arange(T),
        unroll=unroll,
    )
    return jnp.transpose(hs, (1, 0, 2)), jnp.transpose(attn, (1, 0, 2))


def teacher_forced(
    params: Params,
    raw_features: jnp.ndarray,
    captions: jnp.ndarray,
    sample_prob: float = 0.0,
    sample_temp: float = 0.5,
    rng: Optional[jax.Array] = None,
    gru_params: Optional[Dict] = None,
    remat: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Teacher-forced (optionally scheduled-sampling) scoring pass.

    raw_features: [B, R, num_features]; captions: [B, T] int ids.
    Returns (logits [B, T, V], attn [B, T, R]).

    ``remat=True`` checkpoints the scan body (see
    :func:`teacher_forced_hidden`); identical numerics, cheaper backward.
    """
    if not (sample_prob > 0.0 and rng is not None):
        hs, attn = teacher_forced_hidden(
            params, raw_features, captions, gru_params=gru_params,
            remat=remat,
        )
        logits = linear(params["fc"], hs)
        return logits, attn

    features = encode_features(params, raw_features)
    h0 = init_hidden(params, features)
    embeds = embedding(params["embed"], captions)  # [B, T, E]
    B, T, E = embeds.shape
    zero_embed = jnp.zeros((B, E), embeds.dtype)
    coins = jax.random.uniform(jax.random.fold_in(rng, T), (T,))

    def body(carry, xs):
        h, prev_logits = carry
        t, coin = xs
        tf_embed = jnp.where(t == 0, zero_embed, embeds[:, jnp.maximum(t - 1, 0)])
        sampled_ids = jnp.argmax(
            jax.nn.log_softmax(prev_logits / sample_temp, axis=-1), axis=-1
        )
        sampled_embed = embedding(params["embed"], sampled_ids)
        take_sample = jnp.logical_and(coin < sample_prob, t > 0)
        word_embed = jnp.where(take_sample, sampled_embed, tf_embed)
        h, logits, attn = decode_step(params, word_embed, h, features, gru_params)
        return (h, logits), (logits, attn)

    V = params["fc"]["b"].shape[0]
    # carry dtype must match the body's logits (bf16 under mixed precision)
    init_logits = jnp.zeros((B, V), params["fc"]["w"].dtype)
    (_, _), (logits, attn) = jax.lax.scan(
        jax.checkpoint(body) if remat else body,
        (h0, init_logits), (jnp.arange(T), coins),
    )
    return jnp.transpose(logits, (1, 0, 2)), jnp.transpose(attn, (1, 0, 2))


# ====================================================== attention-LSTM ===
def attention_lstm_init(
    key,
    num_features: int,
    embed_dim: int,
    hidden_dim: int,
    vocab_size: int,
    dtype=jnp.float32,
) -> Params:
    """AttentionLstm (/root/reference/models/decoderlstm.py:188-222):
    attends over the raw encoder features (no feature_fc)."""
    keys = jax.random.split(key, 6)
    return {
        "embed": embedding_init(keys[0], vocab_size, embed_dim, dtype),
        "lstm": lstm_cell_init(keys[1], embed_dim + num_features, hidden_dim, dtype),
        "fc": linear_init(keys[2], hidden_dim, vocab_size, dtype),
        "attention": bahdanau_init(keys[3], num_features, hidden_dim),
        "init_h": linear_init(keys[4], num_features, hidden_dim, dtype),
        "init_c": linear_init(keys[5], num_features, hidden_dim, dtype),
    }


def lstm_init_hidden(params: Params, features: jnp.ndarray):
    mean = jnp.mean(features, axis=1)
    return linear(params["init_h"], mean), linear(params["init_c"], mean)


def lstm_decode_step(params, word_embed, hc, features):
    context, attn = bahdanau_attention(params["attention"], features, hc[0])
    x = jnp.concatenate([word_embed, context], axis=-1)
    h, c = lstm_cell(params["lstm"], x, hc)
    logits = linear(params["fc"], h)
    return (h, c), logits, attn


def lstm_teacher_forced(
    params: Params,
    features: jnp.ndarray,
    captions: jnp.ndarray,
    dropout_rate: float = 0.0,
    rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Teacher-forced AttentionLstm pass (t=0 zero-embed quirk preserved)."""
    hc0 = lstm_init_hidden(params, features)
    B, T = captions.shape
    E = params["embed"].shape[1]
    H = params["init_h"]["b"].shape[0]
    zero_embed = jnp.zeros((B, E), jnp.float32)
    embeds = embedding(params["embed"], captions)
    if dropout_rate > 0.0 and rng is not None:
        keep = jax.random.bernoulli(rng, 1.0 - dropout_rate, (T, B, H))
        drop_scale = keep.astype(jnp.float32) / (1.0 - dropout_rate)
    else:
        drop_scale = jnp.ones((T, 1, 1), jnp.float32)

    def body(carry, xs):
        hc = carry
        t, mask = xs
        word_embed = jnp.where(t == 0, zero_embed, embeds[:, jnp.maximum(t - 1, 0)])
        context, attn = bahdanau_attention(params["attention"], features, hc[0])
        x = jnp.concatenate([word_embed, context], axis=-1)
        h, c = lstm_cell(params["lstm"], x, hc)
        logits = linear(params["fc"], h * mask)
        return (h, c), (logits, attn)

    _, (logits, attn) = jax.lax.scan(body, hc0, (jnp.arange(T), drop_scale))
    return jnp.transpose(logits, (1, 0, 2)), jnp.transpose(attn, (1, 0, 2))


def lstm_greedy(
    params: Params,
    features: jnp.ndarray,
    max_len: int = 30,
    end_id: int = 2,
) -> jnp.ndarray:
    """Batched greedy decode for the AttentionLstm
    (/root/reference/models/decoderlstm.py:264-285 greedy_search): start
    token 0 with its embedding NOT zeroed (unlike the teacher-forced
    t=0 quirk), argmax feedback, stop on ``</s>`` or ``max_len``.
    Fixed-shape lax.scan; finished rows emit <pad> (the reference
    decodes B=1 and breaks out of its Python loop instead)."""
    hc0 = lstm_init_hidden(params, features)
    B = features.shape[0]
    tok0 = jnp.zeros((B,), jnp.int32)

    def body(carry, _):
        hc, tok, alive = carry
        word_embed = embedding(params["embed"], tok)
        hc, logits, _ = lstm_decode_step(params, word_embed, hc, features)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        out = jnp.where(alive, nxt, 0)
        alive = alive & (nxt != end_id)
        return (hc, nxt, alive), out

    _, toks = jax.lax.scan(
        body, (hc0, tok0, jnp.ones((B,), bool)), None, length=max_len
    )
    return jnp.transpose(toks, (1, 0))


# ==================================================== plain seq2seq LSTM =
def seq_lstm_init(
    key, embed_dim: int, hidden_dim: int, vocab_size: int, dtype=jnp.float32
) -> Params:
    """DecoderLstm (/root/reference/models/decoderlstm.py:296-320): global
    image feature as the first input token of an nn.LSTM."""
    keys = jax.random.split(key, 3)
    return {
        "embed": embedding_init(keys[0], vocab_size, embed_dim, dtype),
        "lstm": lstm_cell_init(keys[1], embed_dim, hidden_dim, dtype),
        "fc": linear_init(keys[2], hidden_dim, vocab_size, dtype),
    }


def seq_lstm_forward(
    params: Params, feature: jnp.ndarray, captions: jnp.ndarray
) -> jnp.ndarray:
    """feature: [B, E] global feature; captions: [B, T].
    Inputs are [feature, embed(cap[0]), ..., embed(cap[T-2])] — the
    reference drops the last caption token (decoderlstm.py:334-357)."""
    embeds = embedding(params["embed"], captions[:, :-1])
    inputs = jnp.concatenate([feature[:, None, :], embeds], axis=1)  # [B, T, E]
    B, T, _ = inputs.shape
    H = params["fc"]["w"].shape[0]
    h0 = (jnp.zeros((B, H)), jnp.zeros((B, H)))

    def body(hc, x):
        hc = lstm_cell(params["lstm"], x, hc)
        return hc, hc[0]

    _, hs = jax.lax.scan(body, h0, jnp.transpose(inputs, (1, 0, 2)))
    return linear(params["fc"], jnp.transpose(hs, (1, 0, 2)))

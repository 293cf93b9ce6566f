"""Cell-level decoders from the reference's later.py — the models whose
weights the **non-attention** hypernet generates — plus the
Show-Attend-Tell decoder and the simple Lstm_net captioner.

- ``DecoderRNN`` (later.py:227-330): LSTM cell; t=0 input is the image
  feature vector itself (feature dim == embed dim); zero initial states;
  teacher-forced input embed(captions[:, t-1]); no-TF path feeds back a
  **multinomial sample** from softmax of the previous logits (later.py:
  291-300).
- ``DecoderGRU`` (later.py:362-433): same with a GRU cell and — a
  reference quirk kept behind ``random_h0`` — a *uniform-random* initial
  hidden state (later.py:393).
- ``DecoderWithAttention`` (later.py:1-222): Show-Attend-Tell LSTM with a
  gated context (sigmoid(f_beta(h)) * context).  The reference shrinks the
  effective batch per step after sorting by length; here a fixed-shape
  scan with per-position masking computes the same logits at every valid
  position (positions past a caption's length are garbage in the
  reference's buffer too — both sides mask them out of the loss).
- ``Lstm_net`` (later.py:492-516): feature as first token into an LSTM.

These cells reuse captionax.models.rnn so the hypernet emits weights for
them exactly as for the attention decoder (theta pytrees over w_ih/w_hh/
b_ih/b_hh with input_dim == embed_size).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from captionax.models.attention import gated_attention, gated_attention_init
from captionax.models.layers import embedding, embedding_init, linear, linear_init
from captionax.models.rnn import (
    gru_cell,
    gru_cell_init,
    lstm_cell,
    lstm_cell_init,
)

Params = Dict[str, object]


def cell_decoder_init(
    key,
    embed_size: int,
    hidden_size: int,
    vocab_size: int,
    cell: str = "gru",
    num_layers: int = 1,
    dtype=jnp.float32,
) -> Params:
    keys = jax.random.split(key, 3 + max(0, num_layers - 1))
    init = gru_cell_init if cell == "gru" else lstm_cell_init
    params: Params = {
        "cell": init(keys[0], embed_size, hidden_size, dtype),
        "fc_out": linear_init(keys[1], hidden_size, vocab_size, dtype),
        "embed": embedding_init(keys[2], vocab_size, embed_size, dtype),
    }
    if num_layers > 1:
        params["layers"] = [
            init(keys[3 + i], hidden_size, hidden_size, dtype)
            for i in range(num_layers - 1)
        ]
    return params


def _step(params, cell: str, x, state, cell_params=None):
    """One multi-layer cell step.  ``cell_params`` may be a single theta
    dict (layer 0 generated, extras from ``params['layers']``) or a
    list/tuple of per-layer thetas (the non-attention hypernet generates
    EVERY layer's weights, hypernet.py:62-92).  Extra layers feed the
    running hidden state as both input and state — the reference quirk
    ``layer(hidden_state, hidden_state)`` (later.py:412-414)."""
    if isinstance(cell_params, (list, tuple)):
        layer_ps = list(cell_params)
    else:
        layer_ps = [params["cell"] if cell_params is None else cell_params]
        layer_ps.extend(params.get("layers", ()))
    if cell == "gru":
        h = gru_cell(layer_ps[0], x, state)
        for extra in layer_ps[1:]:
            h = gru_cell(extra, h, h)
        return h, h
    h, c = lstm_cell(layer_ps[0], x, state)
    for extra in layer_ps[1:]:
        h, c = lstm_cell(extra, h, (h, c))
    return h, (h, c)


def cell_decoder_forward(
    params: Params,
    features: jnp.ndarray,  # [B, E] global image feature
    captions: jnp.ndarray,  # [B, T]
    cell: str = "gru",
    teacher_forcing: bool = True,
    rng: Optional[jax.Array] = None,
    random_h0: bool = False,
    cell_params: Optional[Dict] = None,
) -> jnp.ndarray:
    """-> logits [B, T, V].  t=0 consumes the feature; t>0 consumes
    embed(captions[:, t-1]) (TF) or a multinomial sample of the previous
    step's softmax (no-TF)."""
    B, T = captions.shape
    H = params["fc_out"]["w"].shape[0]
    V = params["fc_out"]["w"].shape[1]
    if random_h0 and rng is not None:
        h0 = jax.random.uniform(jax.random.fold_in(rng, 0), (B, H))
    else:
        h0 = jnp.zeros((B, H))
    state0 = h0 if cell == "gru" else (h0, jnp.zeros((B, H)))
    embeds = embedding(params["embed"], captions)
    keys = (
        jax.random.split(rng, T)
        if rng is not None
        else jnp.zeros((T, 2), jnp.uint32)
    )

    def body(carry, xs):
        state, prev_logits = carry
        t, key = xs
        if teacher_forcing or rng is None:
            x = jnp.where(
                (t == 0)[..., None], features, embeds[:, jnp.maximum(t - 1, 0)]
            )
        else:
            sampled = jax.random.categorical(key, prev_logits, axis=-1)
            x = jnp.where(
                (t == 0)[..., None],
                features,
                embedding(params["embed"], sampled),
            )
        h, state = _step(params, cell, x, state, cell_params)
        logits = linear(params["fc_out"], h)
        return (state, logits), logits

    (_, _), logits = jax.lax.scan(
        body, (state0, jnp.zeros((B, V))), (jnp.arange(T), keys)
    )
    return jnp.transpose(logits, (1, 0, 2))


def cell_decoder_infer(
    params: Params,
    features: jnp.ndarray,
    max_len: int = 50,
    cell: str = "gru",
    end_id: int = 2,
    cell_params: Optional[Dict] = None,
    random_h0: bool = False,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Greedy inference (later.py DecoderRNN.infer): feature first, then
    argmax feedback.  Returns ids [B, max_len].  ``random_h0`` keeps the
    DecoderGRU quirk of a uniform-random initial hidden state even at
    inference (later.py:464)."""
    B = features.shape[0]
    H = params["fc_out"]["w"].shape[0]
    if random_h0 and rng is not None:
        h0 = jax.random.uniform(rng, (B, H))
    else:
        h0 = jnp.zeros((B, H))
    state0 = h0 if cell == "gru" else (h0, jnp.zeros((B, H)))

    def body(carry, t):
        state, tok, done = carry
        x = jnp.where(
            (t == 0)[..., None], features, embedding(params["embed"], tok)
        )
        h, state = _step(params, cell, x, state, cell_params)
        nxt = jnp.argmax(linear(params["fc_out"], h), axis=-1).astype(jnp.int32)
        emit = jnp.where(done, 0, nxt)
        done = jnp.logical_or(done, nxt == end_id)
        return (state, nxt, done), emit

    (_, _, _), toks = jax.lax.scan(
        body,
        (state0, jnp.zeros((B,), jnp.int32), jnp.zeros((B,), bool)),
        jnp.arange(max_len),
    )
    return jnp.transpose(toks, (1, 0))


# ------------------------------------------- Show-Attend-Tell decoder ---
def show_attend_tell_init(
    key,
    encoder_dim: int,
    embed_dim: int,
    decoder_dim: int,
    attention_dim: int,
    vocab_size: int,
    dtype=jnp.float32,
) -> Params:
    keys = jax.random.split(key, 7)
    params = {
        "attention": gated_attention_init(keys[0], encoder_dim, decoder_dim, attention_dim),
        "embed": jax.random.uniform(keys[1], (vocab_size, embed_dim), dtype, -0.1, 0.1),
        "lstm": lstm_cell_init(keys[2], embed_dim + encoder_dim, decoder_dim, dtype),
        "init_h": linear_init(keys[3], encoder_dim, decoder_dim, dtype),
        "init_c": linear_init(keys[4], encoder_dim, decoder_dim, dtype),
        "f_beta": linear_init(keys[5], decoder_dim, encoder_dim, dtype),
        "fc": linear_init(keys[6], decoder_dim, vocab_size, dtype),
    }
    # fc init U(-0.1, 0.1), bias 0 (later.py init_weights)
    params["fc"]["w"] = jax.random.uniform(
        jax.random.fold_in(keys[6], 1), params["fc"]["w"].shape, dtype, -0.1, 0.1
    )
    params["fc"]["b"] = jnp.zeros_like(params["fc"]["b"])
    return params


def show_attend_tell_forward(
    params: Params,
    encoder_out: jnp.ndarray,  # [B, R, encoder_dim]
    captions: jnp.ndarray,     # [B, T]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Teacher-forced pass -> (logits [B, T-1, V], alphas [B, T-1, R]).

    Step t consumes embed(captions[:, t]) and predicts captions[:, t+1]
    (the reference decodes lengths-1 steps).  Gated context:
    sigmoid(f_beta(h)) * attention_context."""
    B, T = captions.shape
    mean_enc = encoder_out.mean(axis=1)
    h = linear(params["init_h"], mean_enc)
    c = linear(params["init_c"], mean_enc)
    embeds = embedding(params["embed"], captions)

    def body(carry, t):
        h, c = carry
        ctx, alpha = gated_attention(params["attention"], encoder_out, h)
        gate = jax.nn.sigmoid(linear(params["f_beta"], h))
        x = jnp.concatenate([embeds[:, t], gate * ctx], axis=-1)
        h, c = lstm_cell(params["lstm"], x, (h, c))
        logits = linear(params["fc"], h)
        return (h, c), (logits, alpha)

    (_, _), (logits, alphas) = jax.lax.scan(body, (h, c), jnp.arange(T - 1))
    return jnp.transpose(logits, (1, 0, 2)), jnp.transpose(alphas, (1, 0, 2))


def show_attend_tell_sample(
    params: Params, encoder_out: jnp.ndarray, max_len: int = 20,
    bos_id: int = 1, end_id: int = 2,
) -> jnp.ndarray:
    """Greedy sample (later.py:117-165): start from <s>."""
    B = encoder_out.shape[0]
    mean_enc = encoder_out.mean(axis=1)
    h = linear(params["init_h"], mean_enc)
    c = linear(params["init_c"], mean_enc)

    def body(carry, _):
        h, c, tok, done = carry
        ctx, _ = gated_attention(params["attention"], encoder_out, h)
        gate = jax.nn.sigmoid(linear(params["f_beta"], h))
        x = jnp.concatenate([embedding(params["embed"], tok), gate * ctx], -1)
        h, c = lstm_cell(params["lstm"], x, (h, c))
        nxt = jnp.argmax(linear(params["fc"], h), -1).astype(jnp.int32)
        emit = jnp.where(done, 0, nxt)
        done = jnp.logical_or(done, nxt == end_id)
        return (h, c, nxt, done), emit

    (_, _, _, _), toks = jax.lax.scan(
        body,
        (h, c, jnp.full((B,), bos_id, jnp.int32), jnp.zeros((B,), bool)),
        None,
        length=max_len,
    )
    return jnp.transpose(toks, (1, 0))

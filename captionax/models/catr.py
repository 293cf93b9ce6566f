"""CATR: DETR-style encoder-decoder transformer captioner.

Reference: /root/reference/baseline/transformer.py + caption.py +
configuration.py.  Image feature map -> 1x1-conv projection to hidden_dim
-> 6-layer encoder with 2D sine positional embeddings added to q/k at
every layer -> 6-layer causal decoder over caption embeddings with
learned positional embeddings -> 3-layer MLP head to the vocab.  Pre-norm
by default (config.pre_norm=True).

Reference defaults (configuration.py): hidden 256, 8 heads, ffn 2048,
6+6 layers, max_position 128.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from captionax.models.layers import embedding, linear, linear_init
from captionax.models.transformer import (
    causal_mask,
    detr_decoder_layer,
    detr_decoder_layer_init,
    detr_encoder_layer,
    detr_encoder_layer_init,
    layer_norm,
    layer_norm_init,
    sine_position_2d,
)


def catr_init(
    key,
    vocab_size: int,
    hidden: int = 256,
    num_heads: int = 8,
    ff: int = 2048,
    enc_layers: int = 6,
    dec_layers: int = 6,
    max_position: int = 128,
    image_dim: int = 2048,
) -> Dict:
    keys = jax.random.split(key, enc_layers + dec_layers + 6)
    it = iter(keys)
    return {
        "input_proj": linear_init(next(it), image_dim, hidden),  # 1x1 conv
        "word_emb": jax.random.normal(next(it), (vocab_size, hidden)) * 0.02,
        "tgt_pos_emb": jax.random.normal(next(it), (max_position, hidden)) * 0.02,
        "encoder": [detr_encoder_layer_init(next(it), hidden, num_heads, ff)
                    for _ in range(enc_layers)],
        "enc_ln": layer_norm_init(hidden),
        "decoder": [detr_decoder_layer_init(next(it), hidden, num_heads, ff)
                    for _ in range(dec_layers)],
        "dec_ln": layer_norm_init(hidden),
        "mlp": {
            "l0": linear_init(next(it), hidden, 512),
            "l1": linear_init(next(it), 512, 512),
            "l2": linear_init(next(it), 512, vocab_size),
        },
    }


def _num_heads(params) -> int:
    return max(params["word_emb"].shape[1] // 32, 1)


def catr_encode(
    params: Dict,
    image_features: jnp.ndarray,  # [B, R, 2048], R = h*w
    grid_hw=(7, 7),
    pre_norm: bool = True,
    encoder_fn=None,
    num_heads=None,
) -> jnp.ndarray:
    """Image half only -> memory [B, R, H].  Loop-invariant during
    autoregressive decode, so :func:`catr_greedy` runs it once.

    ``encoder_fn(layers_params, x, heads, pos) -> x``: drop-in
    replacement for the sequential encoder stack (e.g. the GPipe
    schedule, parallel/pipeline.py pipelined_catr_stacks) — must keep
    its semantics exactly.  ``num_heads``: override the hidden//32
    default (static under jit; heads do not change param shapes)."""
    heads = num_heads or _num_heads(params)
    hidden = params["word_emb"].shape[1]
    src = linear(params["input_proj"], image_features)  # [B, R, H]
    pos = sine_position_2d(grid_hw[0], grid_hw[1], hidden)[None]
    if encoder_fn is not None:
        x = encoder_fn(params["encoder"], src, heads, pos)
    else:
        x = src
        for layer in params["encoder"]:
            x = detr_encoder_layer(layer, x, pos, heads, pre_norm)
    if pre_norm:
        x = layer_norm(params["enc_ln"], x)
    return x


def catr_decode_logits(
    params: Dict,
    memory: jnp.ndarray,          # [B, R, H] from catr_encode
    captions: jnp.ndarray,        # [B, T] int ids
    grid_hw=(7, 7),
    pre_norm: bool = True,
    decoder_fn=None,
    num_heads=None,
) -> jnp.ndarray:
    """Text half -> logits [B, T, V] given precomputed encoder memory.

    ``decoder_fn(layers_params, tgt, memory, tgt_pos, mem_pos, heads,
    tgt_mask) -> y``: drop-in replacement for the sequential decoder
    stack (see catr_encode)."""
    T = captions.shape[1]
    heads = num_heads or _num_heads(params)
    hidden = params["word_emb"].shape[1]
    pos = sine_position_2d(grid_hw[0], grid_hw[1], hidden)[None]

    tgt = embedding(params["word_emb"], captions)
    tgt_pos = params["tgt_pos_emb"][:T][None]
    tmask = causal_mask(T)
    if decoder_fn is not None:
        y = decoder_fn(params["decoder"], tgt, memory, tgt_pos, pos,
                       heads, tmask)
    else:
        y = tgt
        for layer in params["decoder"]:
            y = detr_decoder_layer(
                layer, y, memory, tgt_pos, pos, heads, pre_norm,
                tgt_mask=tmask
            )
    if pre_norm:
        y = layer_norm(params["dec_ln"], y)

    h = jax.nn.relu(linear(params["mlp"]["l0"], y))
    h = jax.nn.relu(linear(params["mlp"]["l1"], h))
    return linear(params["mlp"]["l2"], h)


def catr_forward(
    params: Dict,
    image_features: jnp.ndarray,  # [B, R, 2048], R = h*w
    captions: jnp.ndarray,        # [B, T] int ids
    grid_hw=(7, 7),
    pre_norm: bool = True,
    encoder_fn=None,
    decoder_fn=None,
    num_heads=None,
) -> jnp.ndarray:
    """-> logits [B, T, V], teacher-forced (causal self-attention)."""
    memory = catr_encode(params, image_features, grid_hw, pre_norm,
                         encoder_fn=encoder_fn, num_heads=num_heads)
    return catr_decode_logits(params, memory, captions, grid_hw, pre_norm,
                              decoder_fn=decoder_fn, num_heads=num_heads)


def catr_greedy(
    params, image_features, max_len: int = 25, bos_id: int = 1, eos_id: int = 2,
    grid_hw=(7, 7), num_heads=None,
) -> jnp.ndarray:
    """Greedy autoregressive decode with a fixed-shape token buffer (the
    full DECODER prefix re-runs each step — caption lengths are tiny, so
    this is cheaper on TPU than maintaining a KV cache for T<=25).  The
    6-layer encoder memory is loop-invariant and computed once up front
    rather than relying on XLA's while-loop LICM to hoist it."""
    B = image_features.shape[0]
    ids = jnp.full((B, max_len), 0, jnp.int32).at[:, 0].set(bos_id)
    memory = catr_encode(params, image_features, grid_hw,
                         num_heads=num_heads)

    def body(t, ids):
        logits = catr_decode_logits(params, memory, ids, grid_hw,
                                    num_heads=num_heads)
        nxt = logits[:, t].argmax(-1).astype(jnp.int32)
        return ids.at[:, t + 1].set(nxt)

    ids = jax.lax.fori_loop(0, max_len - 1, body, ids)
    return ids

"""Shared transformer building blocks (pure functions over pytrees).

One implementation serves the LaBERT masked-LM captioner, the CATR
encoder-decoder, and the BERT-style classifiers.  Attention is dense
batched einsum — at caption scale (49 image + <=64 text tokens) XLA fuses
this onto the MXU without custom kernels.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from captionax.models.layers import linear, linear_init


def layer_norm_init(dim: int):
    return {"gamma": jnp.ones((dim,)), "beta": jnp.zeros((dim,))}


def layer_norm(p, x, eps: float = 1e-12):
    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps) * p["gamma"] + p["beta"]


def mha_init(key, dim: int, num_heads: int, kv_dim: Optional[int] = None):
    kv_dim = kv_dim or dim
    keys = jax.random.split(key, 4)
    return {
        "q": linear_init(keys[0], dim, dim),
        "k": linear_init(keys[1], kv_dim, dim),
        "v": linear_init(keys[2], kv_dim, dim),
        "o": linear_init(keys[3], dim, dim),
    }


def mha(p, q_in, kv_in, num_heads: int, mask: Optional[jnp.ndarray] = None):
    """q_in [B, Tq, D], kv_in [B, Tk, Dk]; mask additive [B, 1|H, Tq|1, Tk]."""
    B, Tq, D = q_in.shape
    Tk = kv_in.shape[1]
    hd = D // num_heads
    q = linear(p["q"], q_in).reshape(B, Tq, num_heads, hd)
    k = linear(p["k"], kv_in).reshape(B, Tk, num_heads, hd)
    v = linear(p["v"], kv_in).reshape(B, Tk, num_heads, hd)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
    if mask is not None:
        scores = scores + mask
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, Tq, D)
    return linear(p["o"], out)


def ffn_init(key, dim: int, hidden: int):
    k1, k2 = jax.random.split(key)
    return {"w1": linear_init(k1, dim, hidden), "w2": linear_init(k2, hidden, dim)}


def ffn(p, x, act=jax.nn.gelu):
    return linear(p["w2"], act(linear(p["w1"], x)))


# ------------------------------------------------ BERT-style encoder ----
def bert_layer_init(key, dim: int, num_heads: int, intermediate: int):
    keys = jax.random.split(key, 4)
    return {
        "attn": mha_init(keys[0], dim, num_heads),
        "attn_ln": layer_norm_init(dim),
        "ffn": ffn_init(keys[1], dim, intermediate),
        "ffn_ln": layer_norm_init(dim),
    }


def bert_layer(p, x, num_heads, mask=None):
    """Post-LN (BERT) ordering: sublayer -> residual -> LN."""
    x = layer_norm(p["attn_ln"], x + mha(p["attn"], x, x, num_heads, mask))
    x = layer_norm(p["ffn_ln"], x + ffn(p["ffn"], x))
    return x


def bert_encoder_init(key, num_layers, dim, num_heads, intermediate):
    keys = jax.random.split(key, num_layers)
    return [bert_layer_init(k, dim, num_heads, intermediate) for k in keys]


def bert_encoder(layers_params, x, num_heads, mask=None):
    for p in layers_params:
        x = bert_layer(p, x, num_heads, mask)
    return x


# --------------------------------------- DETR-style enc/dec layers -----
def detr_encoder_layer_init(key, dim, num_heads, ff):
    keys = jax.random.split(key, 2)
    return {
        "attn": mha_init(keys[0], dim, num_heads),
        "ln1": layer_norm_init(dim),
        "ffn": ffn_init(keys[1], dim, ff),
        "ln2": layer_norm_init(dim),
    }


def detr_encoder_layer(p, x, pos, num_heads, pre_norm=True, mask=None):
    """DETR adds the positional embedding to q/k (not v) at every layer."""
    if pre_norm:
        y = layer_norm(p["ln1"], x)
        x = x + _qk_pos_attn(p["attn"], y, pos, num_heads, mask)
        y = layer_norm(p["ln2"], x)
        x = x + ffn(p["ffn"], y, act=jax.nn.relu)
    else:
        x = layer_norm(p["ln1"], x + _qk_pos_attn(p["attn"], x, pos, num_heads, mask))
        x = layer_norm(p["ln2"], x + ffn(p["ffn"], x, act=jax.nn.relu))
    return x


def _qk_pos_attn(p, x, pos, num_heads, mask):
    """Self-attention where q and k get +pos but v does not."""
    B, T, D = x.shape
    hd = D // num_heads
    q = linear(p["q"], x + pos).reshape(B, T, num_heads, hd)
    k = linear(p["k"], x + pos).reshape(B, T, num_heads, hd)
    v = linear(p["v"], x).reshape(B, T, num_heads, hd)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
    if mask is not None:
        scores = scores + mask
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, T, D)
    return linear(p["o"], out)


def detr_decoder_layer_init(key, dim, num_heads, ff):
    keys = jax.random.split(key, 3)
    return {
        "self_attn": mha_init(keys[0], dim, num_heads),
        "cross_attn": mha_init(keys[1], dim, num_heads),
        "ln1": layer_norm_init(dim),
        "ln2": layer_norm_init(dim),
        "ln3": layer_norm_init(dim),
        "ffn": ffn_init(keys[2], dim, ff),
    }


def detr_decoder_layer(
    p, tgt, memory, tgt_pos, mem_pos, num_heads,
    pre_norm=True, tgt_mask=None, mem_mask=None,
):
    def self_block(t):
        return _qk_pos_attn(p["self_attn"], t, tgt_pos, num_heads, tgt_mask)

    def cross_block(t):
        B, Tq, D = t.shape
        hd = D // num_heads
        q = linear(p["cross_attn"]["q"], t + tgt_pos).reshape(B, Tq, num_heads, hd)
        k = linear(p["cross_attn"]["k"], memory + mem_pos).reshape(
            B, memory.shape[1], num_heads, hd
        )
        v = linear(p["cross_attn"]["v"], memory).reshape(
            B, memory.shape[1], num_heads, hd
        )
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
        if mem_mask is not None:
            scores = scores + mem_mask
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, Tq, D)
        return linear(p["cross_attn"]["o"], out)

    if pre_norm:
        tgt = tgt + self_block(layer_norm(p["ln1"], tgt))
        tgt = tgt + cross_block(layer_norm(p["ln2"], tgt))
        tgt = tgt + ffn(p["ffn"], layer_norm(p["ln3"], tgt), act=jax.nn.relu)
    else:
        tgt = layer_norm(p["ln1"], tgt + self_block(tgt))
        tgt = layer_norm(p["ln2"], tgt + cross_block(tgt))
        tgt = layer_norm(p["ln3"], tgt + ffn(p["ffn"], tgt, act=jax.nn.relu))
    return tgt


def causal_mask(T: int) -> jnp.ndarray:
    """[1, 1, T, T] additive causal mask (CATR generate_square_subsequent_mask,
    /root/reference/baseline/transformer.py:318-325)."""
    m = jnp.tril(jnp.ones((T, T)))
    return jnp.where(m == 0, -1e9, 0.0)[None, None]


def sine_position_2d(h: int, w: int, dim: int, temperature: float = 10000.0):
    """DETR sine positional embedding over an h x w grid -> [h*w, dim]."""
    half = dim // 2
    y = jnp.arange(h, dtype=jnp.float32)[:, None].repeat(w, 1) + 1.0
    x = jnp.arange(w, dtype=jnp.float32)[None, :].repeat(h, 0) + 1.0
    dim_t = temperature ** (
        2 * (jnp.arange(half, dtype=jnp.float32) // 2) / half
    )
    pos_x = x[..., None] / dim_t
    pos_y = y[..., None] / dim_t
    pos_x = jnp.stack(
        [jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], axis=3
    ).reshape(h, w, -1)
    pos_y = jnp.stack(
        [jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], axis=3
    ).reshape(h, w, -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1).reshape(h * w, dim)

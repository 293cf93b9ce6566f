"""Bahdanau additive attention as a pure function.

Math matches the reference ``BahdanauAttention``
(/root/reference/models/attention.py:5-46): scores
``v_a . tanh(W_a f + U_a h)`` softmaxed over the region axis, context =
probability-weighted sum of features.  Batched over all regions at once —
on TPU this is two MXU matmuls + a VPU softmax, fused by XLA; there is no
per-region loop.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from captionax.models.layers import linear, linear_init


def bahdanau_init(key, num_features: int, hidden_dim: int, output_dim: int = 1):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "W_a": linear_init(k1, num_features, hidden_dim),
        "U_a": linear_init(k2, hidden_dim, hidden_dim),
        "v_a": linear_init(k3, hidden_dim, output_dim),
    }


def bahdanau_attention(
    params: Dict, features: jnp.ndarray, hidden: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """features: [B, R, F]; hidden: [B, H] -> (context [B, F], weights [B, R])."""
    att1 = linear(params["W_a"], features)            # [B, R, H]
    att2 = linear(params["U_a"], hidden)[:, None, :]  # [B, 1, H]
    scores = linear(params["v_a"], jnp.tanh(att1 + att2))  # [B, R, 1]
    weights = jax.nn.softmax(scores, axis=1)
    context = jnp.sum(weights * features, axis=1)
    return context, weights[..., 0]


def gated_attention_init(key, encoder_dim: int, decoder_dim: int, attention_dim: int):
    """The Show-Attend-Tell style ReLU attention used by the LSTM path
    (/root/reference/models/encoder.py:76-112)."""
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "encoder_att": linear_init(k1, encoder_dim, attention_dim),
        "decoder_att": linear_init(k2, decoder_dim, attention_dim),
        "full_att": linear_init(k3, attention_dim, 1),
    }


def gated_attention(params: Dict, encoder_out: jnp.ndarray, hidden: jnp.ndarray):
    att1 = linear(params["encoder_att"], encoder_out)      # [B, R, A]
    att2 = linear(params["decoder_att"], hidden)[:, None]  # [B, 1, A]
    att = linear(params["full_att"], jax.nn.relu(att1 + att2))[..., 0]  # [B, R]
    alpha = jax.nn.softmax(att, axis=1)
    context = jnp.sum(encoder_out * alpha[..., None], axis=1)
    return context, alpha

"""LaBERT-style masked-LM transformer captioner.

Reference: /root/reference/baseline/Labert.py + train_baseline_labert.py.
A BERT encoder runs over [image tokens ‖ caption tokens]; image features
pass through a 2048 -> 2048 -> hidden MLP; training predicts the original
ids at [MASK] positions with label smoothing 0.1; caption token-type ids
encode the length bucket (``bounderies`` at train_baseline_labert.py:41).

Deviations from the reference, by design:
- the reference sums word+position+type embeddings after prepending the
  image embedding to *each* stream, so image tokens get 3x image_embed
  (Labert.py:27-30) — faithful here via the ``image_times_3`` flag
  (default True for parity);
- the reference concatenates the text attention mask before the 49 image
  zeros but prepends image embeddings, leaving the mask misaligned and
  the image positions masked out entirely (Labert.py:56-58) — here the
  mask is aligned: image positions visible, text mask covers text.

Inference is iterative mask-predict: start all-[MASK], repeatedly fill
the highest-confidence predictions.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from captionax.models.layers import embedding, linear, linear_init, mlp, mlp_init
from captionax.models.transformer import (
    bert_encoder,
    bert_encoder_init,
    layer_norm,
    layer_norm_init,
)

LENGTH_BOUNDARIES = ((2, 6), (7, 9), (10, 14), (15, 19), (20, 25), (25, 60))


def length_bucket(length: int) -> int:
    for i, (lo, hi) in enumerate(LENGTH_BOUNDARIES):
        if lo <= length <= hi:
            return i
    return len(LENGTH_BOUNDARIES) - 1


def labert_init(
    key,
    vocab_size: int,
    hidden: int = 768,
    num_layers: int = 12,
    num_heads: int = 12,
    intermediate: int = 3072,
    max_position: int = 512,
    num_regions: int = 49,
    image_dim: int = 2048,
) -> Dict:
    keys = jax.random.split(key, 8)
    std = 0.02
    emb = lambda k, n, d: jax.random.normal(k, (n, d)) * std
    type_vocab = len(LENGTH_BOUNDARIES) + 2
    return {
        "image_mlp": mlp_init(keys[0], (image_dim, image_dim, hidden)),
        "word_emb": emb(keys[1], vocab_size, hidden),
        "pos_emb": emb(keys[2], max_position, hidden),
        "type_emb": emb(keys[3], type_vocab, hidden),
        "emb_ln": layer_norm_init(hidden),
        "encoder": bert_encoder_init(keys[4], num_layers, hidden, num_heads, intermediate),
        "head": {
            "dense": linear_init(keys[5], hidden, hidden),
            "ln": layer_norm_init(hidden),
            "decoder": linear_init(keys[6], hidden, vocab_size),
        },
    }


def _num_heads(params) -> int:
    # static: stored as a python int inside the pytree would trace; infer
    # from shapes instead (hidden // 64 matches BERT-base family)
    return max(params["word_emb"].shape[1] // 64, 1)


def labert_forward(
    params: Dict,
    image_features: jnp.ndarray,  # [B, R, 2048]
    token_ids: jnp.ndarray,       # [B, T] (masked during training)
    token_type_ids: jnp.ndarray,  # [B, T]
    attention_mask: jnp.ndarray,  # [B, T] 1=real, 0=pad
    image_times_3: bool = True,
    num_heads=None,
    encoder_fn=None,
) -> jnp.ndarray:
    """-> logits [B, R + T, V] (text logits start at index R)."""
    B, R, _ = image_features.shape
    T = token_ids.shape[1]
    img = mlp(params["image_mlp"], image_features, act=jax.nn.relu)
    words = embedding(params["word_emb"], token_ids)
    pos = params["pos_emb"][:T][None].repeat(B, 0)
    types = embedding(params["type_emb"], token_type_ids)
    text = words + pos + types
    img_part = 3.0 * img if image_times_3 else img
    x = jnp.concatenate([img_part, text], axis=1)
    x = layer_norm(params["emb_ln"], x)

    full_mask = jnp.concatenate(
        [jnp.ones((B, R)), attention_mask.astype(jnp.float32)], axis=1
    )
    additive = (1.0 - full_mask)[:, None, None, :] * -10000.0
    # encoder_fn hook: drop-in replacements for the 12-layer stack, e.g.
    # the pipeline-parallel schedule (parallel/pipeline.py
    # pipelined_bert_encoder) — must keep bert_encoder semantics exactly
    x = (encoder_fn or bert_encoder)(
        params["encoder"], x, num_heads or _num_heads(params), additive
    )

    h = jax.nn.gelu(linear(params["head"]["dense"], x))
    h = layer_norm(params["head"]["ln"], h)
    return linear(params["head"]["decoder"], h)


def mask_tokens(
    rng: jax.Array,
    token_ids: jnp.ndarray,
    mask_id: int,
    pad_id: int = 0,
    min_frac: float = 0.1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """LaBERT-style training masking: per-sample masking ratio drawn
    uniformly, at least one non-pad token masked.
    Returns (masked_ids, mask_positions bool)."""
    B, T = token_ids.shape
    k1, k2 = jax.random.split(rng)
    ratio = jax.random.uniform(k1, (B, 1), minval=min_frac, maxval=1.0)
    scores = jax.random.uniform(k2, (B, T))
    real = token_ids != pad_id
    masked = jnp.logical_and(scores < ratio, real)
    # guarantee at least one mask per row: mask the first real token if none
    none_masked = ~masked.any(axis=1)
    first_real = jnp.argmax(real, axis=1)
    force = jnp.zeros_like(masked).at[jnp.arange(B), first_real].set(True)
    masked = jnp.where(none_masked[:, None], jnp.logical_or(masked, force), masked)
    out = jnp.where(masked, mask_id, token_ids)
    return out, masked


def labert_loss(
    params, image_features, token_ids, token_type_ids, rng,
    mask_id: int, pad_id: int = 0, smoothing: float = 0.1,
    num_heads=None, encoder_fn=None,
) -> jnp.ndarray:
    """Masked-position label-smoothed CE (train_baseline_labert.py:75-99).

    ``encoder_fn``: optional bert_encoder replacement (e.g. the
    pipeline-parallel schedule, parallel/pipeline.py) — semantics
    identical, so the loss is unchanged."""
    masked_ids, mask_pos = mask_tokens(rng, token_ids, mask_id, pad_id)
    attn = (token_ids != pad_id).astype(jnp.float32)
    R = image_features.shape[1]
    logits = labert_forward(
        params, image_features, masked_ids, token_type_ids, attn,
        num_heads=num_heads, encoder_fn=encoder_fn,
    )
    text_logits = logits[:, R:]
    # loss over masked positions only: weight by the mask
    V = text_logits.shape[-1]
    logp = jax.nn.log_softmax(text_logits, axis=-1)
    confidence = 1.0 - smoothing
    low = smoothing / (V - 1)
    onehot = jax.nn.one_hot(token_ids, V)
    true_dist = onehot * confidence + (1.0 - onehot) * low
    nll = -(true_dist * logp).sum(axis=-1)
    w = mask_pos.astype(jnp.float32)
    return (nll * w).sum() / jnp.maximum(w.sum(), 1.0)


def mask_predict_decode(
    params,
    image_features: jnp.ndarray,
    mask_id: int,
    length: int = 15,
    iterations: int = 10,
    pad_id: int = 0,
) -> jnp.ndarray:
    """Iterative mask-predict inference: all-[MASK] start; each round
    re-predicts and keeps the most confident (length - t*length/iters)
    tokens, re-masking the rest."""
    B, R, _ = image_features.shape
    ids = jnp.full((B, length), mask_id, jnp.int32)
    types = jnp.full((B, length), length_bucket(length) + 2, jnp.int32)
    attn = jnp.ones((B, length))

    def body(t, ids):
        logits = labert_forward(params, image_features, ids, types, attn)[:, R:]
        probs = jax.nn.softmax(logits, axis=-1)
        conf = probs.max(axis=-1)
        pred = probs.argmax(axis=-1).astype(jnp.int32)
        n_keep = ((t + 1) * length) // iterations
        thresh = -jnp.sort(-conf, axis=1)[:, jnp.minimum(n_keep, length - 1)]
        keep = conf >= thresh[:, None]
        return jnp.where(keep, pred, mask_id)

    ids = jax.lax.fori_loop(0, iterations, body, ids)
    return ids

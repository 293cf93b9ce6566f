"""Style / domain classifiers (used by the mixup loss and analysis).

Reference family (SURVEY.md §2.6): ``BertClassifer`` variants wrap a
pretrained bert-base + an MLP head (768 -> 4*768 -> num_class with
LeakyReLU/dropout, softmax output, /root/reference/bert_text_classifier.py:
34-72); ``BertEssenceClassifer`` scores caption pairs ("same image?")
with a siamese pooled-output pair; ``StyleClassifer`` is a small
embedding + linear softmax model (classifier.py:32-70).

Pretrained HF weights aren't downloadable here, so the BERT trunk is our
own encoder (captionax.models.transformer), randomly initialized or
loaded from a user-supplied HF state_dict via
:func:`bert_trunk_from_hf_state_dict`.  The classifier head and training
objective match the reference.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from captionax.models.layers import embedding, linear, linear_init
from captionax.models.transformer import (
    bert_encoder,
    bert_encoder_init,
    layer_norm,
    layer_norm_init,
)

STYLE_LABELS = {"factual": 0, "humour": 1, "romantic": 2}


def bert_trunk_init(
    key, vocab_size: int, hidden: int = 768, num_layers: int = 12,
    num_heads: int = 12, intermediate: int = 3072, max_position: int = 512,
    type_vocab: int = 2,
) -> Dict:
    keys = jax.random.split(key, 6)
    std = 0.02
    return {
        "word_emb": jax.random.normal(keys[0], (vocab_size, hidden)) * std,
        "pos_emb": jax.random.normal(keys[1], (max_position, hidden)) * std,
        "type_emb": jax.random.normal(keys[2], (type_vocab, hidden)) * std,
        "emb_ln": layer_norm_init(hidden),
        "encoder": bert_encoder_init(keys[3], num_layers, hidden, num_heads,
                                     intermediate),
        "pooler": linear_init(keys[4], hidden, hidden),
    }


def bert_trunk_apply(params, token_ids, attention_mask, num_heads=None):
    """-> (sequence [B,T,H], pooled [B,H]) like HF BertModel.
    ``num_heads`` defaults to hidden//64 (the BERT-base family ratio)."""
    B, T = token_ids.shape
    heads = num_heads or max(params["word_emb"].shape[1] // 64, 1)
    x = (
        embedding(params["word_emb"], token_ids)
        + params["pos_emb"][:T][None]
        + params["type_emb"][0][None, None]
    )
    x = layer_norm(params["emb_ln"], x)
    additive = (1.0 - attention_mask.astype(jnp.float32))[:, None, None, :] * -10000.0
    x = bert_encoder(params["encoder"], x, heads, additive)
    pooled = jnp.tanh(linear(params["pooler"], x[:, 0]))
    return x, pooled


def style_classifier_init(key, vocab_size: int, num_class: int = 3,
                          hidden: int = 768, num_layers: int = 12) -> Dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "bert": bert_trunk_init(k1, vocab_size, hidden, num_layers),
        "head": {
            "l0": linear_init(k2, hidden, hidden * 4),
            "l1": linear_init(k3, hidden * 4, num_class),
        },
    }


def style_classifier_apply(params, token_ids, attention_mask,
                           dropout_rng=None, dropout: float = 0.2):
    """-> softmax class probabilities [B, num_class] (the reference
    returns softmax, not logits — the mixup loss MSEs probabilities)."""
    _, pooled = bert_trunk_apply(params["bert"], token_ids, attention_mask)
    h = pooled
    if dropout_rng is not None and dropout > 0:
        k1, k2 = jax.random.split(dropout_rng)
        h = h * jax.random.bernoulli(k1, 1 - dropout, h.shape) / (1 - dropout)
    h = jax.nn.leaky_relu(linear(params["head"]["l0"], h))
    if dropout_rng is not None and dropout > 0:
        h = h * jax.random.bernoulli(k2, 1 - dropout, h.shape) / (1 - dropout)
    return jax.nn.softmax(linear(params["head"]["l1"], h), axis=-1)


def essence_classifier_init(key, vocab_size: int, hidden: int = 768,
                            num_layers: int = 12) -> Dict:
    """Siamese pair classifier: same-image? over two captions
    (bert_essence_classifier.py)."""
    k1, k2 = jax.random.split(key)
    return {
        "bert": bert_trunk_init(k1, vocab_size, hidden, num_layers),
        "head": linear_init(k2, hidden * 2, 2),
    }


def essence_classifier_apply(params, ids_a, mask_a, ids_b, mask_b):
    _, pa = bert_trunk_apply(params["bert"], ids_a, mask_a)
    _, pb = bert_trunk_apply(params["bert"], ids_b, mask_b)
    return jax.nn.softmax(linear(params["head"], jnp.concatenate([pa, pb], -1)), -1)


def small_style_classifier_init(key, vocab_size: int, embed_dim: int,
                                num_class: int = 3) -> Dict:
    """StyleClassifer (classifier.py:32-70): embedding -> LeakyReLU ->
    linear -> LeakyReLU, mean over tokens, fc(U(-0.5, 0.5) init)."""
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "embed": jax.random.normal(k1, (vocab_size, embed_dim)),
        "proj": linear_init(k2, embed_dim, embed_dim),
        "fc": {
            "w": jax.random.uniform(k3, (embed_dim, num_class), minval=-0.5, maxval=0.5),
            "b": jnp.zeros((num_class,)),
        },
    }


def small_style_classifier_apply(params, token_ids):
    x = jax.nn.leaky_relu(embedding(params["embed"], token_ids))
    x = jax.nn.leaky_relu(linear(params["proj"], x))
    x = x.mean(axis=1)  # pool over tokens to classify the caption
    return jax.nn.softmax(linear(params["fc"], x), axis=-1)


def small_style_classifier_apply_soft(params, token_probs):
    """Differentiable variant over token distributions [B, T, V]: the
    expected embedding replaces the hard lookup, so the mixup style loss
    (hypernet_attention.py:147-191) back-propagates into the hypernet —
    the reference's text round-trip through a BERT tokenizer is
    gradient-dead there."""
    x = jnp.einsum("btv,ve->bte", token_probs, params["embed"])
    x = jax.nn.leaky_relu(x)
    x = jax.nn.leaky_relu(linear(params["proj"], x))
    x = x.mean(axis=1)
    return jax.nn.softmax(linear(params["fc"], x), axis=-1)


def bert_trunk_apply_soft(params, token_probs, attention_mask=None,
                          num_heads=None):
    """Differentiable trunk over token DISTRIBUTIONS [B, T, V]: the
    expected word embedding replaces the hard lookup (same construction
    as small_style_classifier_apply_soft).  Lets the mixup / style-aux
    losses (hypernet_attention.py:157-176 scores generated captions with
    the trained BertClassifer) back-propagate through a BERT probe — the
    reference's string round-trip through the HF tokenizer passes no
    gradient there."""
    B, T, _ = token_probs.shape
    heads = num_heads or max(params["word_emb"].shape[1] // 64, 1)
    x = (
        jnp.einsum("btv,vh->bth", token_probs, params["word_emb"])
        + params["pos_emb"][:T][None]
        + params["type_emb"][0][None, None]
    )
    x = layer_norm(params["emb_ln"], x)
    if attention_mask is None:
        additive = jnp.zeros((B, 1, 1, T), jnp.float32)
    else:
        additive = (1.0 - attention_mask.astype(jnp.float32))[:, None, None, :] * -10000.0
    x = bert_encoder(params["encoder"], x, heads, additive)
    pooled = jnp.tanh(linear(params["pooler"], x[:, 0]))
    return x, pooled


def style_classifier_apply_soft(params, token_probs):
    """BertClassifer head over soft tokens (frozen-probe use: no
    dropout).  -> softmax class probabilities [B, num_class]."""
    _, pooled = bert_trunk_apply_soft(params["bert"], token_probs)
    h = jax.nn.leaky_relu(linear(params["head"]["l0"], pooled))
    return jax.nn.softmax(linear(params["head"]["l1"], h), axis=-1)


def classifier_soft_apply_fn(classifier_params):
    """Pick the soft-token apply for a classifier params pytree: the
    BERT family carries a 'bert' trunk, the small StyleClassifer doesn't.
    Used by the mixup/style-aux steps so --style-classifier may point at
    either kind (the reference's mixup scores with the trained
    BertClassifer, hypernet_attention.py:157-176)."""
    return (style_classifier_apply_soft if "bert" in classifier_params
            else small_style_classifier_apply_soft)


def classifier_ids_apply_fn(classifier_params):
    """Hard-token counterpart (separation probes, eval)."""
    if "bert" in classifier_params:
        return lambda p, ids: style_classifier_apply(
            p, ids, (ids != 0).astype(jnp.float32))
    return small_style_classifier_apply


def bert_trunk_from_hf_state_dict(state_dict, hidden: int = 768,
                                  num_layers: int = 12) -> Dict:
    """Convert a HuggingFace BertModel state_dict into our trunk pytree."""
    import numpy as np

    def arr(name):
        t = state_dict[name]
        return jnp.asarray(
            np.asarray(t.detach().numpy() if hasattr(t, "detach") else t)
        )

    def lin(prefix):
        return {"w": arr(prefix + ".weight").T, "b": arr(prefix + ".bias")}

    def ln(prefix):
        return {"gamma": arr(prefix + ".weight"), "beta": arr(prefix + ".bias")}

    enc = []
    for i in range(num_layers):
        p = f"encoder.layer.{i}"
        enc.append({
            "attn": {
                "q": lin(f"{p}.attention.self.query"),
                "k": lin(f"{p}.attention.self.key"),
                "v": lin(f"{p}.attention.self.value"),
                "o": lin(f"{p}.attention.output.dense"),
            },
            "attn_ln": ln(f"{p}.attention.output.LayerNorm"),
            "ffn": {
                "w1": lin(f"{p}.intermediate.dense"),
                "w2": lin(f"{p}.output.dense"),
            },
            "ffn_ln": ln(f"{p}.output.LayerNorm"),
        })
    return {
        "word_emb": arr("embeddings.word_embeddings.weight"),
        "pos_emb": arr("embeddings.position_embeddings.weight"),
        "type_emb": arr("embeddings.token_type_embeddings.weight"),
        "emb_ln": ln("embeddings.LayerNorm"),
        "encoder": enc,
        "pooler": lin("pooler.dense"),
    }

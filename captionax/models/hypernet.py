"""Style/domain-conditioned hypernetwork emitting decoder GRU weights.

Re-designs the reference HyperNet (/root/reference/hypernet_attention.py:
32-121, hypernet.py:26-121) the JAX way: the hypernet is a pure function
``style_embed -> theta pytree`` and the decoder consumes theta as an
argument.  The reference's parameter-flipping machinery
(utils.py:24-69 ``flip_parameters_to_tensors``/``set_all_parameters``) has
no equivalent here — weight injection is free, and synthesis batches over
styles with ``vmap`` (the reference cannot mix styles inside a batch;
we can).

Architecture parity (hypernet_attention.py:55-99 with N=1, M=500):
- ``hn_base``: Linear(hyper_emb, N*hyper_emb) + LeakyReLU, twice;
- one ``hn_head`` per generated decoder tensor, bucketed by size:
    w_size//M >= N*hyper_emb : Linear(h, w_size//M) > LeakyReLU > Linear(w_size//M, w_size)
    w_size//M <  N*hyper_emb : Linear(h, h)         > LeakyReLU > Linear(h, w_size)
    w_size < N*hyper_emb     : Linear(h, N)         > LeakyReLU > Linear(N, w_size)
  (the reference's smallest bucket constructs an inconsistent Sequential
  that would fail at runtime — decoderlstm GRU tensors never hit it; we
  use the working equivalent.)
- generated tensor set: the GRUCell's w_ih/w_hh/b_ih/b_hh — 361,200
  weights at feature=embed=hidden=200 — everything else in the decoder
  (feature_fc, embed, fc, attention, init_h) is shared and trained
  directly (configure_optimizers, hypernet_attention.py:123-133).

For FlickrStyle, the style embedding is the decoder embedding-table row of
the style token id (hypernet_attention.py:139-142); for Conceptual
Captions it is a domain embedding of dim ``hyper_emb``
(cc_train_hypernet.py:137-149; schemes in captionax.data.domains).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from captionax.models.layers import embedding, mlp, mlp_init

Params = Dict[str, object]


def gru_tensor_sizes(
    input_dim: int, hidden_dim: int, gates: int = 3
) -> List[Tuple[str, int]]:
    """Generated tensor order = torch cell named_parameters order.
    gates=3 for GRUCell, 4 for LSTMCell (the reference's non-attention
    hypernet generates either, hypernet.py:69-99)."""
    g = gates * hidden_dim
    return [
        ("w_ih", g * input_dim),
        ("w_hh", g * hidden_dim),
        ("b_ih", g),
        ("b_hh", g),
    ]


def _head_dims(w_size: int, h: int, N: int, M: int) -> Tuple[int, ...]:
    if w_size < h:
        return (h, N, w_size)
    if w_size // M < h:
        return (h, h, w_size)
    return (h, w_size // M, w_size)


def hypernet_init(
    key,
    hyper_emb: int,
    input_dim: int,
    hidden_dim: int,
    N: int = 1,
    M: int = 500,
    gates: int = 3,
    dtype=jnp.float32,
) -> Params:
    """Initialize base + per-tensor heads for a recurrent cell
    (gates=3: GRU; gates=4: LSTM)."""
    h = N * hyper_emb
    sizes = gru_tensor_sizes(input_dim, hidden_dim, gates)
    keys = jax.random.split(key, len(sizes) + 1)
    return {
        "base": mlp_init(keys[0], (hyper_emb, h, h), dtype),
        "heads": {
            name: mlp_init(keys[i + 1], _head_dims(w, h, N, M), dtype)
            for i, (name, w) in enumerate(sizes)
        },
    }


def hypernet_apply(hn: Params, style_embed: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """style_embed [hyper_emb] -> GRU theta pytree.

    Batched use: ``jax.vmap(lambda e: hypernet_apply(hn, e))(embeds)``
    gives per-row theta for mixed-style batches.  The cell dims are
    recovered statically from the head output shapes (no meta ints in the
    pytree — they would trace under jit).
    """
    heads = hn["heads"]
    g = heads["b_ih"]["l1"]["b"].shape[0]           # gates * hidden
    hidden_dim = heads["w_hh"]["l1"]["b"].shape[0] // g
    input_dim = heads["w_ih"]["l1"]["b"].shape[0] // g
    base = mlp(hn["base"], style_embed, final_act=True)  # LeakyReLU after both
    flat = {name: mlp(heads[name], base) for name in ("w_ih", "w_hh", "b_ih", "b_hh")}
    return {
        "w_ih": flat["w_ih"].reshape(g, input_dim),
        "w_hh": flat["w_hh"].reshape(g, hidden_dim),
        "b_ih": flat["b_ih"].reshape(g),
        "b_hh": flat["b_hh"].reshape(g),
    }


# ---------------------------------------------------------------- v0 ---
# The ORIGINAL (non-attention) hypernet from /root/reference/hypernet.py:
# a different architecture from the attention one above — base is
# E -> 4E -> 8E (hypernet.py:55-60, LeakyReLU after both), heads are
# bucketed against h = 8E with divisor 8 (hypernet.py:70-89), and one
# head exists per tensor of EVERY cell layer of the captioner
# (named_parameters minus embed.weight / fc_out.{weight,bias}) — the
# reference default runs num_layers=2 (train_captioning.py:61 via
# add_model_specific_args, hypernet.py:209), so layer-1 weights are
# generated too.  fc_out is excluded from generation AND from the
# optimizer (hypernet.py:116-123) — it stays frozen at init, a kept
# reference quirk the training CLIs replicate via a gradient mask.


def _v0_head_dims(w_size: int, h: int) -> Tuple[int, ...]:
    """hypernet.py:70-89 bucketing, h = 8 * embed.

    Unlike the attention variant, the smallest bucket here is
    well-formed: Linear(h, w) > LeakyReLU > Linear(w, w)."""
    if w_size < h:
        return (h, w_size, w_size)
    if w_size // 8 < h:
        return (h, h, w_size)
    return (h, w_size // 8, w_size)


def v0_layer_sizes(
    input_dim: int, hidden_dim: int, gates: int = 3, num_layers: int = 1
) -> List[List[Tuple[str, int]]]:
    """Generated tensor sizes per cell layer, reference order: the first
    cell takes input_dim, extra layers (hypernet.py num_layers>1,
    later.py:377-379) take hidden_dim."""
    out = [gru_tensor_sizes(input_dim, hidden_dim, gates)]
    for _ in range(1, num_layers):
        out.append(gru_tensor_sizes(hidden_dim, hidden_dim, gates))
    return out


def hypernet_v0_init(
    key,
    hyper_emb: int,
    input_dim: int,
    hidden_dim: int,
    gates: int = 3,
    num_layers: int = 1,
    dtype=jnp.float32,
) -> Params:
    """The reference's original HyperNet (hypernet.py:55-92): base
    E -> 4E -> 8E, one bucketed head per generated cell tensor across
    all ``num_layers`` cell layers (gates=3 GRU / 4 LSTM)."""
    h = 8 * hyper_emb
    per_layer = v0_layer_sizes(input_dim, hidden_dim, gates, num_layers)
    n_heads = sum(len(layer) for layer in per_layer)
    keys = jax.random.split(key, n_heads + 1)
    heads = []
    ki = 1
    for layer in per_layer:
        heads.append({
            name: mlp_init(keys[ki + i], _v0_head_dims(w, h), dtype)
            for i, (name, w) in enumerate(layer)
        })
        ki += len(layer)
    return {
        "base": mlp_init(keys[0], (hyper_emb, 4 * hyper_emb, h), dtype),
        "layers": heads,
    }


def _theta_from_flat(flat: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    g = flat["b_ih"].shape[-1]
    return {
        "w_ih": flat["w_ih"].reshape(g, flat["w_ih"].shape[-1] // g),
        "w_hh": flat["w_hh"].reshape(g, flat["w_hh"].shape[-1] // g),
        "b_ih": flat["b_ih"],
        "b_hh": flat["b_hh"],
    }


def hypernet_v0_apply(
    hn: Params, style_embed: jnp.ndarray
) -> List[Dict[str, jnp.ndarray]]:
    """style_embed [hyper_emb] -> list of per-layer cell theta pytrees
    (hypernet.py:104-114 forward, minus the parameter-flipping — theta is
    passed to ``cell_decoder_forward(..., cell_params=thetas)``)."""
    base = mlp(hn["base"], style_embed, final_act=True)
    out = []
    for heads in hn["layers"]:
        flat = {name: mlp(heads[name], base) for name in heads}
        out.append(_theta_from_flat(flat))
    return out


def hypernet_apply_flat(hn: Params, style_embed: jnp.ndarray) -> jnp.ndarray:
    """Concatenated flat theta (the reference's heads_out, for
    distillation-style losses in train_init equivalents)."""
    theta = hypernet_apply(hn, style_embed)
    return jnp.concatenate([theta[k].reshape(-1) for k in ("w_ih", "w_hh", "b_ih", "b_hh")])


def style_embedding_from_vocab(
    decoder_params: Params, style_id: jnp.ndarray
) -> jnp.ndarray:
    """FlickrStyle style conditioning: the decoder embedding row of the
    style token (hypernet_attention.py:139-142)."""
    return embedding(decoder_params["embed"], style_id)


def theta_param_count(input_dim: int, hidden_dim: int) -> int:
    return sum(w for _, w in gru_tensor_sizes(input_dim, hidden_dim))

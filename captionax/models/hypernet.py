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

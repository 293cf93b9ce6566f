"""Recurrent cells as pure functions over weight pytrees.

Gate math and weight layout follow ``torch.nn.GRUCell``/``LSTMCell`` so that
(a) reference checkpoints import tensor-for-tensor and (b) the hypernetwork
emits exactly the tensor set the reference generates — ``w_ih [3H, In]``,
``w_hh [3H, H]``, ``b_ih [3H]``, ``b_hh [3H]`` for the GRU
(/root/reference/hypernet_attention.py:69-99 generates precisely these four,
361,200 weights at In=400, H=200).

On TPU these cells are single fused VPU/MXU programs per step: two matmuls
plus elementwise gates, which XLA fuses; the decode-path Pallas kernel in
``captionax.ops`` consumes the same pytrees.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

CellParams = Dict[str, jnp.ndarray]


def gru_cell_init(key, input_dim: int, hidden_dim: int, dtype=jnp.float32) -> CellParams:
    """U(-1/sqrt(H), 1/sqrt(H)) for every tensor (torch GRUCell default)."""
    bound = 1.0 / math.sqrt(hidden_dim)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    u = lambda k, shape: jax.random.uniform(k, shape, dtype, -bound, bound)
    return {
        "w_ih": u(k1, (3 * hidden_dim, input_dim)),
        "w_hh": u(k2, (3 * hidden_dim, hidden_dim)),
        "b_ih": u(k3, (3 * hidden_dim,)),
        "b_hh": u(k4, (3 * hidden_dim,)),
    }


def gru_cell(params: CellParams, x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """One GRU step. x: [B, In], h: [B, H] -> h': [B, H].

    torch gate order (r, z, n):
        r = sigmoid(W_ir x + b_ir + W_hr h + b_hr)
        z = sigmoid(W_iz x + b_iz + W_hz h + b_hz)
        n = tanh(W_in x + b_in + r * (W_hn h + b_hn))
        h' = (1 - z) * n + z * h

    Weights may carry a leading batch axis (w_ih [B, 3H, In], ...) for
    per-row hypernet-synthesized cells — mixed-style batches decode in one
    program (batched matmuls hit the MXU as grouped GEMMs).
    """
    hd = h.shape[-1]
    if params["w_ih"].ndim == 3:
        gi = jnp.einsum(
            "bgi,bi->bg", params["w_ih"], x,
            preferred_element_type=jnp.float32,
        ) + params["b_ih"]
        gh = jnp.einsum(
            "bgh,bh->bg", params["w_hh"], h,
            preferred_element_type=jnp.float32,
        ) + params["b_hh"]
    else:
        gi = jnp.dot(x, params["w_ih"].T, preferred_element_type=jnp.float32) + params["b_ih"]
        gh = jnp.dot(h, params["w_hh"].T, preferred_element_type=jnp.float32) + params["b_hh"]
    i_r, i_z, i_n = gi[..., :hd], gi[..., hd : 2 * hd], gi[..., 2 * hd :]
    h_r, h_z, h_n = gh[..., :hd], gh[..., hd : 2 * hd], gh[..., 2 * hd :]
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    # gates accumulate in f32 (preferred_element_type); the state keeps
    # the carry dtype so bf16 mixed-precision scans type-check
    return ((1.0 - z) * n + z * h).astype(h.dtype)


def lstm_cell_init(key, input_dim: int, hidden_dim: int, dtype=jnp.float32) -> CellParams:
    """torch LSTMCell default init (uniform with 1/sqrt(H) bound)."""
    bound = 1.0 / math.sqrt(hidden_dim)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    u = lambda k, shape: jax.random.uniform(k, shape, dtype, -bound, bound)
    return {
        "w_ih": u(k1, (4 * hidden_dim, input_dim)),
        "w_hh": u(k2, (4 * hidden_dim, hidden_dim)),
        "b_ih": u(k3, (4 * hidden_dim,)),
        "b_hh": u(k4, (4 * hidden_dim,)),
    }


def lstm_cell(
    params: CellParams, x: jnp.ndarray, hc: Tuple[jnp.ndarray, jnp.ndarray]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One LSTM step with torch gate order (i, f, g, o)."""
    h, c = hc
    hd = h.shape[-1]
    gi = jnp.dot(x, params["w_ih"].T, preferred_element_type=jnp.float32) + params["b_ih"]
    gh = jnp.dot(h, params["w_hh"].T, preferred_element_type=jnp.float32) + params["b_hh"]
    g = gi + gh
    i = jax.nn.sigmoid(g[..., :hd])
    f = jax.nn.sigmoid(g[..., hd : 2 * hd])
    gg = jnp.tanh(g[..., 2 * hd : 3 * hd])
    o = jax.nn.sigmoid(g[..., 3 * hd :])
    c_new = f * c + i * gg
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def gru_theta_size(input_dim: int, hidden_dim: int) -> int:
    """Flat size of the hypernet-generated GRU tensor set."""
    return 3 * hidden_dim * (input_dim + hidden_dim + 2)


def gru_theta_unflatten(
    theta: jnp.ndarray, input_dim: int, hidden_dim: int
) -> CellParams:
    """Flat [P] vector -> GRU cell pytree, in the reference's generation
    order (w_ih, w_hh, b_ih, b_hh — named_parameters order of GRUCell)."""
    g = 3 * hidden_dim
    sizes = [g * input_dim, g * hidden_dim, g, g]
    offs = [0]
    for s in sizes:
        offs.append(offs[-1] + s)
    return {
        "w_ih": theta[offs[0] : offs[1]].reshape(g, input_dim),
        "w_hh": theta[offs[1] : offs[2]].reshape(g, hidden_dim),
        "b_ih": theta[offs[2] : offs[3]],
        "b_hh": theta[offs[3] : offs[4]],
    }

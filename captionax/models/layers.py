"""Functional neural-net building blocks over plain pytrees.

captionax deliberately avoids a module system: every layer is an
``init(key, ...) -> params`` plus an ``apply(params, x) -> y`` pair over
nested dicts of ``jnp`` arrays.  This is what makes the hypernetwork
trivial on TPU — generated decoder weights are just another pytree passed
to a pure function (SURVEY.md §7.1), with no parameter-flipping machinery
like the reference's ``flip_parameters_to_tensors``/``set_all_parameters``
(/root/reference/utils.py:24-69).

Initializers match PyTorch defaults so that reference-trained checkpoints
can be imported tensor-for-tensor and fresh training starts from the same
distribution family.
"""

from __future__ import annotations

import math
from typing import Dict, Sequence

import jax
import jax.numpy as jnp

Params = Dict[str, object]


# ---------------------------------------------------------------- linear
def linear_init(key, in_dim: int, out_dim: int, dtype=jnp.float32) -> Params:
    """nn.Linear default init: kaiming-uniform W, uniform bias, both with
    bound 1/sqrt(in_dim).  Weight stored [in, out] (JAX convention)."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    return {
        "w": jax.random.uniform(kw, (in_dim, out_dim), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (out_dim,), dtype, -bound, bound),
    }


def linear(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    return jnp.dot(x, params["w"], preferred_element_type=x.dtype) + params["b"]


# ------------------------------------------------------------- embedding
def embedding_init(key, vocab_size: int, dim: int, dtype=jnp.float32) -> jnp.ndarray:
    """nn.Embedding default init: standard normal."""
    return jax.random.normal(key, (vocab_size, dim), dtype)


def embedding(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(table, ids, axis=0)


# ------------------------------------------------------------------ mlp
def mlp_init(
    key, dims: Sequence[int], dtype=jnp.float32
) -> Params:
    """Stack of linears; activation applied between them by ``mlp``."""
    keys = jax.random.split(key, len(dims) - 1)
    return {
        f"l{i}": linear_init(keys[i], dims[i], dims[i + 1], dtype)
        for i in range(len(dims) - 1)
    }


def mlp(params: Params, x: jnp.ndarray, act=jax.nn.leaky_relu,
        final_act: bool = False) -> jnp.ndarray:
    n = len(params)
    for i in range(n):
        x = linear(params[f"l{i}"], x)
        if i < n - 1 or final_act:
            x = act(x)
    return x


def count_params(tree) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))

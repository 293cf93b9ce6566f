"""Sequence and expert parallelism over named mesh axes.

The reference runs every transformer forward on one device with the
full token axis resident (LaBERT's 12-layer BERT over 49 image + T text
tokens, /root/reference/LaBERT-master/modeling.py; CATR's DETR stacks,
/root/reference/baseline/transformer.py) and synthesizes hypernet
weight banks style-by-style in a Python loop
(/root/reference/hypernet_attention.py:139-142 picks one style per
batch).  Neither has any distributed form there.  Here both become
mesh axes:

**Sequence parallelism** (``seq`` axis): activations [B, T, D] are
sharded over T.  LayerNorm / FFN / residuals are pointwise over tokens
so they run on local shards untouched; attention needs the full key
space, for which two standard TPU schedules are provided:

- ``ring=False`` (default): K/V projections are computed on local
  tokens then ``all_gather``-ed over ``seq`` (one [B, T, D] hop per
  layer riding ICI) — queries stay sharded, so score/softmax/context
  memory per chip is [B, H, T/S, T] instead of [B, H, T, T].  The
  math is the dense attention computed blockwise by query rows:
  softmax rows are complete, so results match the dense encoder to
  float-accumulation order.
- ``ring=True``: flash-style online softmax over K/V blocks streamed
  around the ring with ``ppermute`` (S static steps, one [B, T/S, D]
  hop each).  Peak memory per chip is [B, H, T/S, T/S]; values match
  dense attention up to softmax reassociation (~1e-6 in f32).

Both are differentiable (all_gather/ppermute transpose to
reduce-scatter / inverse permute), compose with a ``data`` axis, and
plug into ``labert_forward(..., encoder_fn=...)`` exactly like the
GPipe schedule (parallel/pipeline.py).

**Expert parallelism** (``expert`` axis): the hypernetwork is a bank
of per-style/per-domain weight generators — the natural expert axis is
the conditioning row.  :func:`expert_theta_bank` shards theta-bank
synthesis over styles/domains (the CC hypernet conditions on 150+
domains, /root/reference/cc_train_hypernet.py), each chip running the
full hypernet MLP over its slice of the embedding rows, then
all-gathers the bank so every chip can serve mixed-style batches.
Output matches ``train.steps.synthesize_theta_batched`` exactly.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

shard_map = jax.shard_map

from captionax.models.layers import linear
from captionax.models.transformer import ffn, layer_norm


def sequence_mesh(
    n_seq: int, n_data: int = 1,
    seq_axis: str = "seq", data_axis: str = "data",
) -> Mesh:
    """A ``data x seq`` mesh from the first n_data*n_seq local devices."""
    devices = np.asarray(jax.devices()[: n_data * n_seq]).reshape(
        n_data, n_seq
    )
    return Mesh(devices, (data_axis, seq_axis))


def _mask_rows(mask, q_start: int | jnp.ndarray, tq: int):
    """Slice the additive mask's QUERY axis (-2) to this chip's rows.

    Padding masks ([B, 1, 1, Tk]) broadcast over queries and pass
    through; causal-style masks carry a full query axis that must
    follow the query shard (transformer.causal_mask -> [1, 1, T, T]).
    """
    if mask is None or mask.shape[-2] == 1:
        return mask
    return lax.dynamic_slice_in_dim(mask, q_start, tq, axis=-2)


def _sp_mha_allgather(p, x_loc, mask, num_heads: int, seq_axis: str):
    """Dense attention with queries sharded over ``seq_axis``: K/V are
    projected locally and all-gathered; each chip computes its own
    softmax rows (complete rows — no cross-chip reduction needed)."""
    B, tq, D = x_loc.shape
    hd = D // num_heads
    q = linear(p["q"], x_loc).reshape(B, tq, num_heads, hd)
    k = lax.all_gather(linear(p["k"], x_loc), seq_axis, axis=1, tiled=True)
    v = lax.all_gather(linear(p["v"], x_loc), seq_axis, axis=1, tiled=True)
    Tk = k.shape[1]
    k = k.reshape(B, Tk, num_heads, hd)
    v = v.reshape(B, Tk, num_heads, hd)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
    if mask is not None:
        scores = scores + _mask_rows(mask, lax.axis_index(seq_axis) * tq, tq)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, tq, D)
    return linear(p["o"], out)


def _sp_mha_ring(p, x_loc, mask, num_heads: int, seq_axis: str):
    """Ring attention: K/V blocks circulate with ppermute; each chip
    folds one block per step into a running (max, denom, numerator)
    online softmax.  S steps, all static — the loop unrolls under jit."""
    S = lax.psum(1, seq_axis)
    i = lax.axis_index(seq_axis)
    B, tq, D = x_loc.shape
    hd = D // num_heads
    q = (linear(p["q"], x_loc).reshape(B, tq, num_heads, hd)
         .astype(jnp.float32))
    k_blk = linear(p["k"], x_loc).reshape(B, tq, num_heads, hd)
    v_blk = linear(p["v"], x_loc).reshape(B, tq, num_heads, hd)

    # large-finite init (not -inf): keeps exp() and its gradient clean —
    # the first block's max always replaces it since masks are -1e4/-1e9
    m = jnp.full((B, num_heads, tq, 1), -1e30, jnp.float32)
    l = jnp.zeros((B, num_heads, tq, 1), jnp.float32)
    acc = jnp.zeros((B, tq, num_heads, hd), jnp.float32)
    perm = [(s, (s + 1) % S) for s in range(S)]
    q_start = i * tq

    for step in range(S):
        # after `step` hops this chip holds the block owned by i - step
        blk = (i - step) % S
        s = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k_blk.astype(jnp.float32)
        ) / math.sqrt(hd)
        if mask is not None:
            mrows = _mask_rows(mask, q_start, tq)
            s = s + lax.dynamic_slice_in_dim(
                mrows.astype(jnp.float32), blk * tq, tq, axis=-1
            )
        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        scale = jnp.exp(m - m_new)  # renormalize running sums to new max
        e = jnp.exp(s - m_new)
        l = l * scale + e.sum(axis=-1, keepdims=True)
        acc = acc * scale.transpose(0, 2, 1, 3) + jnp.einsum(
            "bhqk,bkhd->bqhd", e, v_blk.astype(jnp.float32)
        )
        m = m_new
        if step + 1 < S:
            k_blk = lax.ppermute(k_blk, seq_axis, perm)
            v_blk = lax.ppermute(v_blk, seq_axis, perm)

    out = (acc / l.transpose(0, 2, 1, 3)).reshape(B, tq, D)
    return linear(p["o"], out.astype(x_loc.dtype))


def _sp_bert_layer(p, x_loc, mask, num_heads: int, seq_axis: str,
                   ring: bool):
    attn = _sp_mha_ring if ring else _sp_mha_allgather
    x_loc = layer_norm(
        p["attn_ln"], x_loc + attn(p["attn"], x_loc, mask, num_heads,
                                   seq_axis)
    )
    return layer_norm(p["ffn_ln"], x_loc + ffn(p["ffn"], x_loc))


def sequence_parallel_bert_encoder(
    mesh: Mesh,
    num_heads: int,
    seq_axis: str = "seq",
    data_axis: Optional[str] = None,
    ring: bool = False,
) -> Callable:
    """A drop-in for :func:`captionax.models.transformer.bert_encoder`
    with the token axis sharded over ``seq_axis`` — plugs into
    ``labert_forward(..., encoder_fn=...)``.

    The seq-axis size must divide the total token count (LaBERT: 49
    image + T text); pad the text side (pad-id tokens, attention 0) to
    satisfy it — masked-out columns do not change any real row's
    softmax.  Accepts the layer list or a stacked [L, ...] pytree.
    """
    from captionax.parallel.pipeline import unstack_layers

    n_seq = mesh.shape[seq_axis]
    x_spec = P(data_axis, seq_axis, None)
    mask_spec = P(data_axis, None, None, None)

    def body(layers_params, x_loc, mask):
        for p in layers_params:
            x_loc = _sp_bert_layer(p, x_loc, mask, num_heads, seq_axis,
                                   ring)
        return x_loc

    def encoder(layers_params, x, heads, mask):
        del heads  # fixed at build time (static under jit)
        layers = (
            layers_params if isinstance(layers_params, (list, tuple))
            else unstack_layers(layers_params)
        )
        T = x.shape[1]
        if T % n_seq:
            raise ValueError(
                f"token axis {T} not divisible by seq={n_seq}; pad the "
                "text side (see docstring)"
            )
        B = x.shape[0]
        if mask is None:  # bert_encoder's mask is Optional — keep that
            mask = jnp.zeros((B, 1, 1, T), x.dtype)
        if mask.shape[0] != B:  # batch-less (e.g. causal) masks
            mask = jnp.broadcast_to(mask, (B,) + mask.shape[1:])
        return shard_map(
            lambda xx, mm: body(layers, xx, mm),
            mesh=mesh, in_specs=(x_spec, mask_spec), out_specs=x_spec,
        )(x, mask)

    return encoder


# ------------------------------------------------ expert parallelism ----
def expert_theta_bank(
    mesh: Mesh, expert_axis: str = "expert",
) -> Callable:
    """Shard hypernet theta-bank synthesis over the conditioning rows.

    Returns ``synth(params, style_embeds [S, E]) -> theta bank`` equal to
    ``train.steps.synthesize_theta_batched`` (each theta leaf [S, ...],
    replicated on every chip): chip e runs the hypernet MLP over rows
    [e*S/E, (e+1)*S/E) and the bank is all-gathered.  The expert-axis
    size must divide S.  Relay note: like the batched synthesis, keep this
    in its own dispatch, separate from the fused decode kernels
    (CLAUDE.md relay compile limits).
    """
    from captionax.models.hypernet import hypernet_apply

    n_expert = mesh.shape[expert_axis]

    def body(params, emb_blk):
        theta_blk = jax.vmap(lambda e: hypernet_apply(params["hn"], e))(
            emb_blk
        )
        return jax.tree_util.tree_map(
            lambda t: lax.all_gather(t, expert_axis, axis=0, tiled=True),
            theta_blk,
        )

    def synth(params, style_embeds):
        S = style_embeds.shape[0]
        if S % n_expert:
            raise ValueError(
                f"bank size {S} not divisible by expert={n_expert}"
            )
        return shard_map(
            body, mesh=mesh,
            in_specs=(P(), P(expert_axis, None)), out_specs=P(),
            # the all_gather makes every output replicated, but the
            # static VMA check cannot infer that through tree_map
            check_vma=False,
        )(params, style_embeds)

    return synth

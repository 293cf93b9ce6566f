"""GPipe-style pipeline parallelism over a mesh axis.

The reference trains its transformer families on one device — LaBERT's
12-layer BERT encoder (/root/reference/modeling.py via pytorch_transformers)
and CATR's 6+6 DETR stacks (/root/reference/models/transformer_cc.py); its
distributed hooks are dead code (SURVEY.md §2.10).  Here pipeline
parallelism is a first-class mesh axis for any homogeneous layer stack:

- the L layers are stacked ([L, ...] leaves, :func:`stack_layers`) and
  split into S contiguous stages sharded over the ``pipe`` mesh axis, so
  each chip holds L/S layers' weights for the whole program (HBM-resident,
  never reloaded);
- microbatches flow through the stage ring via ``lax.ppermute`` — the only
  inter-chip traffic is one [mb, T, D] activation hop per tick, riding ICI;
- the whole schedule is a single ``lax.scan`` under jit + ``shard_map``
  (fixed trip count M + S - 1, no data-dependent Python control flow), and
  it is differentiable end-to-end: ``jax.grad`` flows back through the
  inverse ring permutation, so the same machinery serves training with no
  separate backward schedule.  Bubble fraction is the usual
  (S - 1) / (M + S - 1); raise ``n_micro`` to amortize it.

Composes with data parallelism: build the mesh with both axes
(e.g. ``Mesh(devices.reshape(2, 4), ("data", "pipe"))``) and the batch
axis of every microbatch is sharded over ``data`` while stages split over
``pipe``; gradients psum over ``data`` exactly as in
:mod:`captionax.parallel.mesh`.

Scale note: microbatch inputs (and per-microbatch extras such as attention
masks) are replicated over the ``pipe`` axis and indexed by tick — for the
caption-scale transformers here, activations are tiny next to stage
weights.  At much larger T*D, feed stage 0 from a host iterator per
microbatch instead.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P


def stack_layers(layers: Sequence):
    """Stack a list of per-layer param pytrees into [L, ...] leaves.

    The inverse of how ``bert_encoder_init``/CATR init return layer lists;
    stacked layouts are what ``lax.scan`` and stage sharding consume.
    """
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *layers)


def unstack_layers(stacked) -> list:
    """[L, ...] leaves back to a list of per-layer pytrees."""
    n = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    return [
        jax.tree_util.tree_map(lambda a, i=i: a[i], stacked) for i in range(n)
    ]


def split_stages(stacked, n_stages: int):
    """Reshape stacked [L, ...] leaves to [S, L // S, ...] (contiguous
    stage assignment).  L must divide evenly — pipeline stages must be
    homogeneous for the single-program schedule."""

    def _split(a):
        L = a.shape[0]
        if L % n_stages:
            raise ValueError(
                f"layer count {L} not divisible by n_stages={n_stages}"
            )
        return a.reshape(n_stages, L // n_stages, *a.shape[1:])

    return jax.tree_util.tree_map(_split, stacked)


def _apply_stage(layer_fn: Callable, stage_params, x, extra):
    """Run this device's L/S layers over x with lax.scan (stage_params
    leaves arrive as [1, L/S, ...] under shard_map — drop the stage axis)."""
    sp = jax.tree_util.tree_map(lambda a: a[0], stage_params)

    def body(h, lp):
        return layer_fn(lp, h, *extra), None

    h, _ = lax.scan(body, x, sp)
    return h


def make_pipeline(
    layer_fn: Callable,
    mesh: Mesh,
    n_micro: int,
    pipe_axis: str = "pipe",
    data_axis: Optional[str] = None,
):
    """Build a jitted pipelined apply for a homogeneous layer stack.

    ``layer_fn(layer_params, x, *extras) -> x`` is one layer (e.g.
    ``transformer.bert_layer`` with num_heads closed over).  The returned
    callable has signature ``f(stacked_params, x, *extras)`` with
    ``stacked_params`` leaves [L, ...], ``x`` [B, T, D], and each extra a
    per-example array [B, ...] threaded to the layer at the right tick
    (attention masks, positional adds).  Output equals sequentially
    applying the L layers — test-enforced, forward and grad
    (tests/test_pipeline.py).
    """
    S = mesh.shape[pipe_axis]
    M = n_micro
    ring = [(i, (i + 1) % S) for i in range(S)]

    def shard_fn(stages, xs, *extras):
        # xs: [M, mb, T, D]; extras: [M, mb, ...]; stages: [1, L/S, ...]
        stage_id = lax.axis_index(pipe_axis)
        # the carry becomes pipe-varying after one tick (stage weights
        # differ per device) — mark the initial zeros varying so the scan
        # carry type is stable under shard_map's vma checking
        state = lax.pcast(jnp.zeros_like(xs[0]), pipe_axis, to="varying")
        outs = lax.pcast(jnp.zeros_like(xs), pipe_axis, to="varying")

        def tick(carry, t):
            state, outs = carry
            # feed: stage 0 picks up microbatch t (garbage flows on other
            # stages' warmup ticks and is masked at collection)
            feed = lax.dynamic_index_in_dim(
                xs, jnp.clip(t, 0, M - 1), 0, keepdims=False
            )
            state = jnp.where(stage_id == 0, feed, state)
            # this stage is processing microbatch t - stage_id
            mb_here = jnp.clip(t - stage_id, 0, M - 1)
            extra = [
                lax.dynamic_index_in_dim(e, mb_here, 0, keepdims=False)
                for e in extras
            ]
            state = _apply_stage(layer_fn, stages, state, extra)
            # collect: the last stage just finished microbatch t - (S - 1)
            done = t - (S - 1)
            slot = jnp.clip(done, 0, M - 1)
            cur = lax.dynamic_index_in_dim(outs, slot, 0, keepdims=False)
            write = jnp.logical_and(stage_id == S - 1, done >= 0)
            outs = lax.dynamic_update_index_in_dim(
                outs, jnp.where(write, state, cur), slot, 0
            )
            # rotate the ring: stage s -> s + 1 (last wraps to 0, harmless)
            state = lax.ppermute(state, pipe_axis, ring)
            return (state, outs), None

        (_, outs), _ = lax.scan(
            tick, (state, outs), jnp.arange(M + S - 1)
        )
        # outs is populated only on the last stage (zeros elsewhere):
        # psum over pipe replicates it everywhere
        return lax.psum(outs, pipe_axis)

    batch_spec = P(None, data_axis) if data_axis else P(None)

    @jax.jit
    def pipelined(stacked_params, x, *extras):
        B = x.shape[0]
        if B % M:
            raise ValueError(f"batch {B} not divisible by n_micro={M}")
        mb = B // M
        stages = split_stages(stacked_params, S)
        xs = x.reshape(M, mb, *x.shape[1:])
        es = tuple(e.reshape(M, mb, *e.shape[1:]) for e in extras)
        sharded = jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(pipe_axis),) + (batch_spec,) * (1 + len(es)),
            out_specs=batch_spec,
        )
        out = sharded(stages, xs, *es)
        return out.reshape(B, *x.shape[1:])

    return pipelined


def sequential_apply(layer_fn: Callable, stacked_params, x, *extras):
    """Reference semantics for :func:`make_pipeline` (single device):
    scan the L layers in order.  Used by tests and as the S=1 fallback."""

    def body(h, lp):
        return layer_fn(lp, h, *extras), None

    h, _ = lax.scan(body, x, stacked_params)
    return h


def pipelined_bert_encoder(
    mesh: Mesh,
    n_micro: int,
    num_heads: int,
    pipe_axis: str = "pipe",
    data_axis: Optional[str] = None,
) -> Callable:
    """A drop-in for :func:`captionax.models.transformer.bert_encoder`
    running the layer stack as a pipeline over ``mesh`` — plugs into
    ``labert_forward(..., encoder_fn=...)`` (LaBERT's 12 BERT layers are
    the deepest stack in the reference, /root/reference/LaBERT-master).

    Accepts the layer list or an already-stacked [L, ...] pytree; the
    additive attention mask (any [B, ...] broadcastable form) rides the
    schedule as a per-microbatch extra.
    """
    from captionax.models.transformer import bert_layer

    pipe = make_pipeline(
        lambda p, h, m: bert_layer(p, h, num_heads, m),
        mesh, n_micro, pipe_axis=pipe_axis, data_axis=data_axis,
    )

    def encoder(layers_params, x, heads, mask):
        del heads  # fixed at build time (static under jit)
        stacked = (
            stack_layers(layers_params)
            if isinstance(layers_params, (list, tuple))
            else layers_params
        )
        B = x.shape[0]
        if mask.shape[0] != B:  # batch-less (e.g. causal) masks: tile the
            mask = jnp.broadcast_to(mask, (B,) + mask.shape[1:])  # batch axis
        return pipe(stacked, x, mask)

    return encoder


def pipelined_catr_stacks(
    mesh: Mesh,
    n_micro: int,
    num_heads: int,
    pre_norm: bool = True,
    pipe_axis: str = "pipe",
    data_axis: Optional[str] = None,
):
    """GPipe schedules for BOTH halves of CATR's DETR transformer
    (/root/reference/baseline/transformer.py 6+6 stacks): returns
    ``(encoder_fn, decoder_fn)`` plugging into
    ``catr_forward(..., encoder_fn=..., decoder_fn=...)``.

    Each half is its own homogeneous stack on the same ``pipe`` ring;
    per-layer invariants (sine positions, decoder memory, causal mask)
    ride the schedule as per-microbatch extras.
    """
    from captionax.models.transformer import (
        detr_decoder_layer, detr_encoder_layer,
    )

    enc_pipe = make_pipeline(
        lambda p, h, pos: detr_encoder_layer(p, h, pos, num_heads,
                                             pre_norm),
        mesh, n_micro, pipe_axis=pipe_axis, data_axis=data_axis,
    )
    dec_pipe = make_pipeline(
        lambda p, y, mem, tpos, mpos, tmask: detr_decoder_layer(
            p, y, mem, tpos, mpos, num_heads, pre_norm, tgt_mask=tmask
        ),
        mesh, n_micro, pipe_axis=pipe_axis, data_axis=data_axis,
    )

    def _batched(a, B):
        """Broadcast batchless per-layer invariants onto the batch axis
        so they microbatch like everything else."""
        return (jnp.broadcast_to(a, (B,) + a.shape[1:])
                if a.shape[0] != B else a)

    def encoder_fn(layers_params, x, heads, pos):
        # heads is fixed at build time; the model derives its value from
        # hidden//32 (catr._num_heads) — catch a mismatch loudly
        assert heads == num_heads, (heads, num_heads)
        stacked = (
            stack_layers(layers_params)
            if isinstance(layers_params, (list, tuple))
            else layers_params
        )
        return enc_pipe(stacked, x, _batched(pos, x.shape[0]))

    def decoder_fn(layers_params, tgt, memory, tgt_pos, mem_pos, heads,
                   tgt_mask):
        assert heads == num_heads, (heads, num_heads)
        stacked = (
            stack_layers(layers_params)
            if isinstance(layers_params, (list, tuple))
            else layers_params
        )
        B = tgt.shape[0]
        return dec_pipe(
            stacked, tgt, _batched(memory, B), _batched(tgt_pos, B),
            _batched(mem_pos, B), _batched(tgt_mask, B),
        )

    return encoder_fn, decoder_fn


def pipeline_mesh(
    n_pipe: int,
    n_data: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """A ('data', 'pipe') mesh — the pipeline counterpart of
    :func:`captionax.parallel.mesh.make_mesh`."""
    devices = list(devices if devices is not None else jax.devices())
    use = np.asarray(devices[: n_data * n_pipe]).reshape(n_data, n_pipe)
    return Mesh(use, ("data", "pipe"))

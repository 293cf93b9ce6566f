"""Pipeline parallelism (parallel/pipeline.py): GPipe schedule over the
virtual 8-device CPU mesh must match sequential layer application exactly —
forward, with per-microbatch extras (attention masks), composed with data
parallelism, and through jax.grad (training path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from captionax.models import transformer as tfm
from captionax.parallel.pipeline import (
    make_pipeline,
    pipeline_mesh,
    sequential_apply,
    split_stages,
    stack_layers,
    unstack_layers,
)

HEADS, DIM, FF, L, B, T = 4, 32, 64, 8, 8, 6


@pytest.fixture(scope="module")
def stacked():
    layers = tfm.bert_encoder_init(
        jax.random.PRNGKey(0), L, DIM, HEADS, FF
    )
    return stack_layers(layers)


@pytest.fixture(scope="module")
def x():
    return jax.random.normal(jax.random.PRNGKey(1), (B, T, DIM))


def _layer(p, h, mask=None):
    return tfm.bert_layer(p, h, HEADS, mask)


def test_stack_roundtrip(stacked):
    layers = unstack_layers(stacked)
    assert len(layers) == L
    again = stack_layers(layers)
    for a, b in zip(
        jax.tree_util.tree_leaves(stacked), jax.tree_util.tree_leaves(again)
    ):
        np.testing.assert_array_equal(a, b)


def test_split_stages_rejects_uneven(stacked):
    with pytest.raises(ValueError, match="not divisible"):
        split_stages(stacked, 3)


def test_sequential_matches_loop(stacked, x):
    ref = x
    for p in unstack_layers(stacked):
        ref = tfm.bert_layer(p, ref, HEADS)
    out = sequential_apply(_layer, stacked, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("n_pipe,n_micro", [(4, 4), (8, 2), (2, 8)])
def test_pipeline_matches_sequential(stacked, x, n_pipe, n_micro):
    mesh = pipeline_mesh(n_pipe)
    f = make_pipeline(_layer, mesh, n_micro)
    out = f(stacked, x)
    ref = sequential_apply(_layer, stacked, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pipeline_with_mask_extra(stacked, x):
    # per-example additive attention masks must reach the layer at the
    # tick its microbatch is being processed, at every stage
    lengths = jnp.asarray([T, T - 1, T - 2, 3, T, 2, T - 3, 1])
    keep = jnp.arange(T)[None, :] < lengths[:, None]          # [B, T]
    mask = jnp.where(keep[:, None, None, :], 0.0, -1e9)      # [B,1,1,T]
    mask = jnp.broadcast_to(mask, (B, 1, T, T))
    mesh = pipeline_mesh(4)
    f = make_pipeline(_layer, mesh, n_micro=4)
    out = f(stacked, x, mask)
    ref = sequential_apply(_layer, stacked, x, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pipeline_composes_with_data_parallel(stacked, x):
    mesh = pipeline_mesh(n_pipe=4, n_data=2)
    f = make_pipeline(_layer, mesh, n_micro=2, data_axis="data")
    out = f(stacked, x)
    ref = sequential_apply(_layer, stacked, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pipeline_grad_matches_sequential(stacked, x):
    # the schedule is one differentiable scan: grads through ppermute's
    # inverse ring must equal the single-device stack's grads
    mesh = pipeline_mesh(4)
    f = make_pipeline(_layer, mesh, n_micro=4)
    tgt = jax.random.normal(jax.random.PRNGKey(2), (B, T, DIM))

    def loss_pipe(p):
        return jnp.mean((f(p, x) - tgt) ** 2)

    def loss_seq(p):
        return jnp.mean((sequential_apply(_layer, p, x) - tgt) ** 2)

    g_pipe = jax.grad(loss_pipe)(stacked)
    g_seq = jax.grad(loss_seq)(stacked)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_pipe), jax.tree_util.tree_leaves(g_seq)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_pipeline_rejects_bad_microbatch(stacked, x):
    mesh = pipeline_mesh(4)
    f = make_pipeline(_layer, mesh, n_micro=3)
    with pytest.raises(ValueError, match="not divisible"):
        f(stacked, x)


def test_labert_pipelined_encoder_matches():
    # the encoder_fn hook: LaBERT's 12-layer stack (8 here) run as a
    # 4-stage pipeline must reproduce labert_forward exactly
    from captionax.models import labert
    from captionax.parallel.pipeline import pipelined_bert_encoder

    key = jax.random.PRNGKey(3)
    params = labert.labert_init(
        key, vocab_size=64, hidden=32, num_layers=8, num_heads=4,
        intermediate=64, max_position=32, num_regions=4, image_dim=16,
    )
    Bq, R, T = 8, 4, 6
    feats = jax.random.normal(jax.random.PRNGKey(4), (Bq, R, 16))
    ids = jax.random.randint(jax.random.PRNGKey(5), (Bq, T), 0, 64)
    types = jnp.zeros((Bq, T), jnp.int32)
    amask = jnp.ones((Bq, T))
    ref = labert.labert_forward(params, feats, ids, types, amask, num_heads=4)
    enc = pipelined_bert_encoder(pipeline_mesh(4), n_micro=4, num_heads=4)
    out = labert.labert_forward(
        params, feats, ids, types, amask, num_heads=4, encoder_fn=enc
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_catr_forward_pipelined_stacks_match():
    # both CATR halves (6+6 reference shape, 4+4 here) as GPipe schedules
    # through the catr_forward hooks must equal the sequential model
    from captionax.models import catr
    from captionax.parallel.pipeline import pipelined_catr_stacks

    params = catr.catr_init(
        jax.random.PRNGKey(8), vocab_size=64, hidden=32, num_heads=4,
        ff=64, enc_layers=4, dec_layers=4, image_dim=16,
    )
    Bq, T = 8, 6
    feats = jax.random.normal(jax.random.PRNGKey(9), (Bq, 6, 16))
    caps = jax.random.randint(jax.random.PRNGKey(10), (Bq, T), 0, 64)
    ref = catr.catr_forward(params, feats, caps, grid_hw=(2, 3),
                            num_heads=4)
    enc, dec = pipelined_catr_stacks(pipeline_mesh(4), n_micro=4,
                                     num_heads=4)
    out = catr.catr_forward(params, feats, caps, grid_hw=(2, 3),
                            encoder_fn=enc, decoder_fn=dec, num_heads=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_catr_encoder_stack_pipelines_via_extras():
    # generality check: the DETR encoder layer's per-position embedding
    # rides the schedule as an extra (broadcast over batch)
    key = jax.random.PRNGKey(6)
    layers = [
        tfm.detr_encoder_layer_init(k, DIM, HEADS, FF)
        for k in jax.random.split(key, 4)
    ]
    stackd = stack_layers(layers)
    pos = tfm.sine_position_2d(2, 3, DIM)[None]           # [1, 6, D]
    xin = jax.random.normal(jax.random.PRNGKey(7), (B, 6, DIM))

    def layer(p, h, pos_b):
        return tfm.detr_encoder_layer(p, h, pos_b, HEADS, pre_norm=True)

    ref = xin
    for p in layers:
        ref = tfm.detr_encoder_layer(p, ref, pos, HEADS, pre_norm=True)

    mesh = pipeline_mesh(4)
    f = make_pipeline(layer, mesh, n_micro=4)
    pos_b = jnp.broadcast_to(pos, (B, 6, DIM))
    out = f(stackd, xin, pos_b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

"""Jitted train/eval step builders for the captioning models.

Each builder closes over an optax transform and returns pure
``(state, batch, ...) -> (state, metrics)`` functions suitable for
``jax.jit`` with data-parallel shardings (see captionax.parallel.mesh).

Model equivalents:
- ``make_gru_steps``       — CaptionAttentionGru / CaptionGruNet trainers
  (/root/reference/train_attention_gru.py:32-126, train_gru.py:29):
  train every decoder parameter with CE on teacher-forced logits.
- ``make_hypernet_steps``  — HyperNet trainers
  (/root/reference/hypernet_attention.py:32-240): the GRU cell weights
  come from the hypernet conditioned on the style embedding; the
  decoder's own gru tensors are inert (they receive zero gradient and
  never move, mirroring configure_optimizers' parameter split).

Validation mirrors the reference's two losses: teacher-forced CE
("val_loss with TF", the checkpoint/LR-plateau monitor) and free-running
CE at sample_prob=1.0 ("val_loss", hypernet_attention.py:220-240).

Batches are dicts of fixed-shape arrays:
    features  [B, R, num_features]  (encoder output)
    captions  [B, T] int32
    style_id  []     int32 (batch-homogeneous, like the reference's
                            per-batch style collate) — hypernet models only
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from captionax.models import decoder as dec
from captionax.models.hypernet import hypernet_apply
from captionax.models.layers import embedding
from captionax.train.losses import cross_entropy_loss
from captionax.train.state import TrainState


def _tf_logits(decoder_params, batch, sample_prob=0.0, rng=None, gru_params=None):
    return dec.teacher_forced(
        decoder_params,
        batch["features"],
        batch["captions"],
        sample_prob=sample_prob,
        rng=rng,
        gru_params=gru_params,
    )[0]


# ------------------------------------------------------------- plain GRU
def make_gru_steps(tx, pad_id: int = 0):
    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        def loss_fn(params):
            logits = _tf_logits(params, batch)
            return cross_entropy_loss(logits, batch["captions"], pad_id)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        state = state.apply_gradients(grads, tx)
        return state, {"train_loss": loss}

    def eval_step(params, batch) -> Dict:
        logits_tf = _tf_logits(params, batch)
        logits_fr = _tf_logits(
            params, batch, sample_prob=1.0, rng=jax.random.PRNGKey(0)
        )
        return {
            "val_loss_tf": cross_entropy_loss(logits_tf, batch["captions"], pad_id),
            "val_loss": cross_entropy_loss(logits_fr, batch["captions"], pad_id),
            "logits_tf": logits_tf,
        }

    return train_step, eval_step


# -------------------------------------------------------------- hypernet
def style_token_embed(params, batch):
    """FlickrStyle conditioning: the decoder embedding-table row of the
    (batch-homogeneous) style token id."""
    return embedding(params["decoder"]["embed"], batch["style_id"])


def synthesize_theta(params, style_id):
    """Batch-homogeneous weight synthesis: style token -> embed row ->
    hypernet -> GRU theta (one set per batch, like the reference)."""
    style_embed = embedding(params["decoder"]["embed"], style_id)
    return hypernet_apply(params["hn"], style_embed)


def synthesize_theta_batched(params, style_embeds):
    """Per-row synthesis for mixed-style batches (vmap over styles)."""
    return jax.vmap(lambda e: hypernet_apply(params["hn"], e))(style_embeds)


def make_hypernet_steps(tx, pad_id: int = 0, embed_fn: Callable = style_token_embed):
    """``embed_fn(params, batch) -> style/domain embedding`` selects the
    conditioning source: vocab style tokens (FlickrStyle) or a
    DomainEmbedder projection reading batch['domain_value'] (CC)."""

    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        def loss_fn(params):
            theta = hypernet_apply(params["hn"], embed_fn(params, batch))
            logits = _tf_logits(params["decoder"], batch, gru_params=theta)
            return cross_entropy_loss(logits, batch["captions"], pad_id)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        state = state.apply_gradients(grads, tx)
        return state, {"train_loss": loss}

    def eval_step(params, batch) -> Dict:
        theta = hypernet_apply(params["hn"], embed_fn(params, batch))
        logits_tf = _tf_logits(params["decoder"], batch, gru_params=theta)
        logits_fr = _tf_logits(
            params["decoder"],
            batch,
            sample_prob=1.0,
            rng=jax.random.PRNGKey(0),
            gru_params=theta,
        )
        return {
            "val_loss_tf": cross_entropy_loss(logits_tf, batch["captions"], pad_id),
            "val_loss": cross_entropy_loss(logits_fr, batch["captions"], pad_id),
            "logits_tf": logits_tf,
        }

    return train_step, eval_step


def batch_shardings(mesh, example_batch):
    """Per-leaf shardings: leading axis over ``data`` for arrays,
    replicated for scalars (style_id)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, P("data") if jnp.ndim(x) >= 1 else P()),
        example_batch,
    )


def jit_data_parallel(
    step_fn: Callable, mesh, example_batch, donate_state: bool = True
):
    """jit a (state, batch) step with params replicated and the batch
    sharded over the ``data`` mesh axis; XLA inserts the gradient psum."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    return jax.jit(
        step_fn,
        in_shardings=(repl, batch_shardings(mesh, example_batch)),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate_state else (),
    )

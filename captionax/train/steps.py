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

from functools import partial
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from captionax.models import decoder as dec
from captionax.models.hypernet import hypernet_apply
from captionax.models.layers import embedding
from captionax.train.losses import cross_entropy_loss, fused_ce_from_hidden
from captionax.train.state import TrainState


def _bf16(tree):
    """f32 leaves -> bf16 (mixed-precision compute; the cast is
    differentiable and its transpose returns f32 grads to the masters)."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        tree,
    )


def _tf_logits(decoder_params, batch, sample_prob=0.0, rng=None,
               gru_params=None, bf16=False, remat=False):
    """Teacher-forced logits, always returned in f32 (the CE/log_softmax
    runs in f32 for stability even under bf16 compute).

    ``bf16=True`` = mixed precision: master params stay f32 in the
    optimizer; the decoder matmuls/scan run in bfloat16 (the reference
    trains f32 only — this is an opt-in TPU speedup, --bf16-compute)."""
    features = batch["features"]
    if bf16:
        decoder_params = _bf16(decoder_params)
        gru_params = None if gru_params is None else _bf16(gru_params)
        features = features.astype(jnp.bfloat16)
    logits = dec.teacher_forced(
        decoder_params,
        features,
        batch["captions"],
        sample_prob=sample_prob,
        rng=rng,
        gru_params=gru_params,
        remat=remat,
    )[0]
    return logits.astype(jnp.float32)


def _tf_ce(decoder_params, batch, pad_id, gru_params=None, bf16=False,
           remat=True, unroll=1, fused=False):
    """Pure-teacher-forced CE via the fused chunked loss: the recurrence
    scan emits [B,T,H] hidden states and fused_ce_from_hidden reduces them
    without materializing [B*T,V] logits.  Value identical to
    cross_entropy_loss(_tf_logits(...)).

    ``fused=True`` swaps the lax.scan recurrence for the Pallas fused
    fwd+BPTT kernel (ops.train_kernel — opt-in, --fused-scan): the
    25-step recurrence is latency-bound in XLA (~30x off roofline,
    benchmarks/trainstep_roofline.py) and one kernel holding the loop
    pipelines it.  Scan-equality (values + all grads) is test-enforced
    (tests/test_train_kernel.py)."""
    features = batch["features"]
    if bf16:
        decoder_params = _bf16(decoder_params)
        gru_params = None if gru_params is None else _bf16(gru_params)
        features = features.astype(jnp.bfloat16)
    if fused:
        from captionax.ops.train_kernel import fused_teacher_forced_hidden

        hs, _ = fused_teacher_forced_hidden(
            decoder_params, features, batch["captions"],
            gru_params=gru_params,
        )
    else:
        hs, _ = dec.teacher_forced_hidden(
            decoder_params, features, batch["captions"],
            gru_params=gru_params, remat=remat, unroll=unroll,
        )
    return fused_ce_from_hidden(
        decoder_params["fc"], hs, batch["captions"], pad_id
    )


# ------------------------------------------------------------- plain GRU
def make_gru_steps(tx, pad_id: int = 0, bf16: bool = False,
                   remat: bool = True, unroll: int = 1,
                   fused_scan: bool = False):
    """``remat`` checkpoints the decode scan in the train loss (identical
    numerics, backward recomputes the attention step instead of saving
    [B,R,H] residuals — measured ~11 ms of the 84 ms f32 step at B=1024).
    ``fused_scan`` swaps the recurrence for the Pallas train kernel."""
    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        def loss_fn(params):
            return _tf_ce(params, batch, pad_id, bf16=bf16, remat=remat,
                          unroll=unroll, fused=fused_scan)

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


def dedicated_style_embed(params, batch):
    """Opt-in deviation: style conditioning from a dedicated 3-row
    table (``params['style_embed']``) indexed by style_id in 0..2 —
    fixes the reference's 'humour'-><unk> pollution (the OOV embedding
    receives gradients from every unknown word; measured cost in
    BASELINE.md's style-separation table).  Pair with
    ``FlickrStyleData(dedicated_style_tokens=True)``."""
    return embedding(params["style_embed"], batch["style_id"])


def style_table(params):
    """The embedding table style ids index into: the dedicated 3-row
    table when the model was built with it, else the decoder vocab
    embedding (reference semantics)."""
    return params.get("style_embed", params["decoder"]["embed"])


def resolve_style_id(params, vocab, style: str) -> int:
    """Host-side style-name -> id in whichever space ``params`` uses:
    0/1/2 for dedicated-table models, vocab(style) otherwise (including
    the reference's 'humour'-><unk> quirk)."""
    if "style_embed" in params:
        from captionax.data.flickr import STYLE_NAMES

        return STYLE_NAMES.index(style)
    return int(vocab(style))


def synthesize_theta(params, style_id):
    """Batch-homogeneous weight synthesis: style token -> embed row ->
    hypernet -> GRU theta (one set per batch, like the reference).
    With a dedicated style table present, style_id indexes that table
    instead (see :func:`dedicated_style_embed` / :func:`resolve_style_id`)."""
    style_embed = embedding(style_table(params), style_id)
    return hypernet_apply(params["hn"], style_embed)


def synthesize_theta_batched(params, style_embeds):
    """Per-row synthesis for mixed-style batches (vmap over styles)."""
    return jax.vmap(lambda e: hypernet_apply(params["hn"], e))(style_embeds)


def make_hypernet_steps(tx, pad_id: int = 0,
                        embed_fn: Callable = style_token_embed,
                        bf16: bool = False, remat: bool = True,
                        unroll: int = 1, fused_scan: bool = False):
    """``embed_fn(params, batch) -> style/domain embedding`` selects the
    conditioning source: vocab style tokens (FlickrStyle) or a
    DomainEmbedder projection reading batch['domain_value'] (CC).
    ``remat``/``fused_scan``: see make_gru_steps (the kernel's theta
    gradient flows back into the hypernet like the scan's)."""

    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        def loss_fn(params):
            theta = hypernet_apply(params["hn"], embed_fn(params, batch))
            return _tf_ce(params["decoder"], batch, pad_id,
                          gru_params=theta, bf16=bf16, remat=remat,
                          unroll=unroll, fused=fused_scan)

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


def make_hypernet_mixup_steps(
    tx,
    classifier_params,
    pad_id: int = 0,
    alpha: float = 0.3,
    style_ids=(4, 3, 6),
    embed_fn: Callable = style_token_embed,
    split: bool = False,
):
    """Hypernet training with the style-mixup auxiliary loss
    (hypernet_attention.py:147-191): interpolate two style embeddings,
    free-run the decoder with the synthesized weights, score the caption
    with a (frozen) style classifier, and MSE the class probabilities
    against the mix coefficients.  loss = alpha*CE + (1-alpha)*style_loss.

    Differs from the reference by design: the classifier consumes the
    soft token distribution (expected embeddings) so the style loss is
    differentiable end-to-end; the reference decodes to a string and
    re-tokenizes, which passes no gradient.  ``style_ids`` defaults to
    the reference's vocab mapping {factual: 4, humour: <unk>=3,
    romantic: 6}; pass (0, 1, 2) for dedicated-style-token models
    (the mix rows then come from params['style_embed']).

    ``split=True`` returns a step computing the SAME total gradient as
    two separate jitted dispatches (CE branch and style branch; exact
    by linearity of the gradient) plus a combine+apply dispatch.  Use
    it on the axon relay, whose AOT compile helper wedges on the single
    fused grad graph (two 25-step TF scans + soft classifier in one
    jit) at production dims — CLAUDE.md.  The returned function is
    marked ``_prejitted``; callers must NOT wrap it in an outer
    ``jax.jit``."""
    from captionax.models.classifiers import classifier_soft_apply_fn
    from captionax.train.losses import mixup_style_target

    # the probe may be the small StyleClassifer or a trained BERT
    # classifier (the reference's mixup scores with BertClassifer,
    # hypernet_attention.py:157-176) — dispatch on the params pytree
    clf_apply = classifier_soft_apply_fn(classifier_params)
    sid = jnp.asarray(style_ids, jnp.int32)

    def train_step(state: TrainState, batch, rng) -> Tuple[TrainState, Dict]:
        k_coeff, k_missing, k_sample = jax.random.split(rng, 3)
        coeff = jax.random.uniform(k_coeff)
        missing = jax.random.randint(k_missing, (), 0, 3)
        # remaining styles in list order: m=0 -> (h, r); 1 -> (f, r); 2 -> (f, h)
        s1 = jnp.where(missing == 0, sid[1], sid[0])
        s2 = jnp.where(missing == 2, sid[1], sid[2])

        def loss_fn(params):
            theta = hypernet_apply(params["hn"], embed_fn(params, batch))
            logits = _tf_logits(params["decoder"], batch, gru_params=theta)
            ce = cross_entropy_loss(logits, batch["captions"], pad_id)

            emb = style_table(params)
            mix_embed = coeff * emb[s1] + (1.0 - coeff) * emb[s2]
            theta_mix = hypernet_apply(params["hn"], mix_embed)
            logits_mix = _tf_logits(
                params["decoder"], batch, sample_prob=1.0, rng=k_sample,
                gru_params=theta_mix,
            )
            probs = jax.nn.softmax(logits_mix, axis=-1)
            pred = clf_apply(classifier_params, probs)
            target = mixup_style_target(coeff, missing)
            style_loss = jnp.mean((pred - target[None, :]) ** 2)
            return alpha * ce + (1.0 - alpha) * style_loss, (ce, style_loss)

        (loss, (ce, sl)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads, tx)
        return state, {"train_loss": loss, "ce_loss": ce, "style_loss": sl}

    if not split:
        return train_step

    def ce_loss_fn(params, batch):
        theta = hypernet_apply(params["hn"], embed_fn(params, batch))
        logits = _tf_logits(params["decoder"], batch, gru_params=theta)
        return cross_entropy_loss(logits, batch["captions"], pad_id)

    def style_loss_fn(params, batch, rng):
        # identical rng consumption order to the fused path so both
        # variants draw the same (coeff, missing, sample) per step
        k_coeff, k_missing, k_sample = jax.random.split(rng, 3)
        coeff = jax.random.uniform(k_coeff)
        missing = jax.random.randint(k_missing, (), 0, 3)
        s1 = jnp.where(missing == 0, sid[1], sid[0])
        s2 = jnp.where(missing == 2, sid[1], sid[2])
        emb = style_table(params)
        mix_embed = coeff * emb[s1] + (1.0 - coeff) * emb[s2]
        theta_mix = hypernet_apply(params["hn"], mix_embed)
        logits_mix = _tf_logits(
            params["decoder"], batch, sample_prob=1.0, rng=k_sample,
            gru_params=theta_mix,
        )
        probs = jax.nn.softmax(logits_mix, axis=-1)
        pred = clf_apply(classifier_params, probs)
        target = mixup_style_target(coeff, missing)
        return jnp.mean((pred - target[None, :]) ** 2)

    ce_grad = jax.jit(jax.value_and_grad(ce_loss_fn))
    style_grad = jax.jit(jax.value_and_grad(style_loss_fn))

    @partial(jax.jit, donate_argnums=(0,))
    def combine_apply(state, g_ce, g_sl):
        grads = jax.tree_util.tree_map(
            lambda a, b: alpha * a + (1.0 - alpha) * b, g_ce, g_sl
        )
        return state.apply_gradients(grads, tx)

    def split_step(state: TrainState, batch, rng) -> Tuple[TrainState, Dict]:
        ce, g_ce = ce_grad(state.params, batch)
        sl, g_sl = style_grad(state.params, batch, rng)
        state = combine_apply(state, g_ce, g_sl)
        return state, {
            "train_loss": alpha * ce + (1.0 - alpha) * sl,
            "ce_loss": ce,
            "style_loss": sl,
        }

    split_step._prejitted = True
    return split_step


def make_hypernet_styleaux_steps(
    tx,
    classifier_params,
    pad_id: int = 0,
    alpha: float = 0.7,
    style_ids=(4, 3, 6),
    embed_fn: Callable = style_token_embed,
    split: bool = False,
):
    """Hypernet training with a style-identification auxiliary loss —
    a captionax extension (no reference equivalent; the reference's only
    style regularizer is the mixup loss, hypernet_attention.py:147-191,
    which measurably COLLAPSES style separation — BASELINE.md).

    The auxiliary term free-runs the decoder under the batch's OWN
    synthesized theta and asks a frozen style classifier to recognize
    the style:  aux = CE(classifier(soft free-run caption), style).
    Unlike mixup (interpolated targets whose easy minimum is
    style-insensitive theta), this term is minimized only when each
    style's free-running output is linearly separable from the others,
    so it pushes styles APART.  loss = alpha*CE + (1-alpha)*aux; the
    default alpha=0.7 keeps CE dominant (mixup's reference alpha=0.3
    put 70% of the gradient on the style term).

    The gradient path reuses the differentiable soft-token classifier
    built for mixup (small or BERT probe, dispatched on the params
    pytree — classifiers.classifier_soft_apply_fn).
    ``style_ids`` maps class index 0/1/2 -> the style_id values seen in
    batches (vocab rows (4, 3, 6) by default, incl. the reference's
    'humour'-><unk>=3 quirk; (0, 1, 2) for dedicated-style-token
    models); batch['style_id'] must be one of them.  ``style_ids=None``
    instead reads the probe class directly from ``batch['probe_cls']``
    (int32 scalar) — for models whose batches are not style-keyed, e.g.
    the combined Flickr+CC hypernet scored by a 4-class f/h/r/CC probe
    (TrainConfig.style_aux_from_batch).

    ``split=True``: same contract as make_hypernet_mixup_steps — the
    identical total gradient as two jitted dispatches (CE / aux; exact
    by linearity) plus combine+apply, for the axon relay whose AOT
    helper wedges on fused two-scan grad graphs at production dims.
    The returned function is ``_prejitted``; don't wrap it in jax.jit."""
    from captionax.models.classifiers import classifier_soft_apply_fn

    clf_apply = classifier_soft_apply_fn(classifier_params)
    sid = None if style_ids is None else jnp.asarray(style_ids, jnp.int32)

    def aux_loss(params, batch, rng):
        theta = hypernet_apply(params["hn"], embed_fn(params, batch))
        logits_fr = _tf_logits(
            params["decoder"], batch, sample_prob=1.0, rng=rng,
            gru_params=theta,
        )
        probs = jax.nn.softmax(logits_fr, axis=-1)
        pred = clf_apply(classifier_params, probs)
        cls = (batch["probe_cls"] if sid is None
               else jnp.argmax(sid == batch["style_id"]))
        return -jnp.mean(jnp.log(pred[:, cls] + 1e-9))

    def ce_loss(params, batch):
        theta = hypernet_apply(params["hn"], embed_fn(params, batch))
        logits = _tf_logits(params["decoder"], batch, gru_params=theta)
        return cross_entropy_loss(logits, batch["captions"], pad_id)

    def train_step(state: TrainState, batch, rng) -> Tuple[TrainState, Dict]:
        def loss_fn(params):
            ce = ce_loss(params, batch)
            aux = aux_loss(params, batch, rng)
            return alpha * ce + (1.0 - alpha) * aux, (ce, aux)

        (loss, (ce, aux)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads, tx)
        return state, {"train_loss": loss, "ce_loss": ce, "style_loss": aux}

    if not split:
        return train_step

    ce_grad = jax.jit(jax.value_and_grad(ce_loss))
    aux_grad = jax.jit(jax.value_and_grad(aux_loss))

    @partial(jax.jit, donate_argnums=(0,))
    def combine_apply(state, g_ce, g_aux):
        grads = jax.tree_util.tree_map(
            lambda a, b: alpha * a + (1.0 - alpha) * b, g_ce, g_aux
        )
        return state.apply_gradients(grads, tx)

    def split_step(state: TrainState, batch, rng) -> Tuple[TrainState, Dict]:
        ce, g_ce = ce_grad(state.params, batch)
        aux, g_aux = aux_grad(state.params, batch, rng)
        state = combine_apply(state, g_ce, g_aux)
        return state, {
            "train_loss": alpha * ce + (1.0 - alpha) * aux,
            "ce_loss": ce,
            "style_loss": aux,
        }

    split_step._prejitted = True
    return split_step


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

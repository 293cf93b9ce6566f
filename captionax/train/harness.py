"""The training/eval harness: the PyTorch-Lightning-trainer equivalent.

One ``CaptionTrainer`` drives every model family the reference spreads
over ~12 LightningModule subclasses (SURVEY.md §1 L4): plain GRU/LSTM
captioners, the FlickrStyle hypernet, and the CC domain hypernet.

Differences from the reference, by design (SURVEY.md §7.1):
- quality metrics (BLEU/METEOR/ROUGE/CIDEr) run on accumulated eval
  decodes, not synchronously on every training step — the reference's
  dominant CPU cost;
- the encoder runs as its own jitted program over each batch's images
  (or is skipped when the pipeline delivers precomputed features);
- checkpoints are Orbax trees, LR plateau mirrors
  ReduceLROnPlateau(cooldown=2, factor=0.5) on 'val_loss with TF'.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import numpy as np

from captionax.core.config import TrainConfig
from captionax.data.loader import BatchLoader
from captionax.data.transforms import preprocess_images
from captionax.decode import beam_search
from captionax.eval.metrics import CaptionMetrics, metric_score_test
from captionax.models.encoder import encoder_cnn
from captionax.train.checkpoint import BestCheckpointer
from captionax.train.logging import MetricLogger
from captionax.train.state import (
    PlateauScheduler,
    create_train_state,
    get_lr,
    make_optimizer,
    set_lr,
)
from captionax.train.steps import (
    jit_data_parallel,
    make_gru_steps,
    make_hypernet_steps,
    style_token_embed,
)

DEVICE_BATCH_KEYS = ("features", "captions", "style_id", "domain_value",
                     "probe_cls")


class FeatureCache:
    """Cache of frozen-encoder outputs keyed by dataset index.

    The reference re-runs its frozen CNN on every batch of every epoch
    (train_attention_gru.py:105); since the encoder is frozen the
    features are a pure function of the image, so each image is encoded
    exactly once and served from the cache afterwards (float16,
    ~200 KB/image at 49x2048 — the whole Flickr7k corpus is ~1.4 GB).
    The encoder already computes in bfloat16, so the f16 round-trip is
    lossless for practical purposes.

    ``device=True`` additionally keeps the cache HBM-resident: new rows
    are appended to an on-device f16 table (one small host->device
    transfer when first encoded) and warm batches are served by a
    jitted gather+cast — zero host->device feature traffic from epoch 2
    on.  Besides the bandwidth, this sidesteps the axon relay image's
    plugin bug where every host->device transfer's bytes leak in host
    RSS (CLAUDE.md): the host path re-leaks ~batch-bytes every step,
    the device path only the one f16 append per new image."""

    def __init__(self, encode_fn, encoder_params, device: bool = False):
        self._encode = encode_fn
        self._params = encoder_params
        self._store: dict = {}
        self._device = device
        self._row: dict = {}      # key -> row index in the device table
        self._table = None        # jnp [N, ...] float16, append-grown
        self._gather = None

    def _append_device(self, rows_np):
        import jax
        import jax.numpy as jnp

        fresh = jnp.asarray(rows_np)  # [n, ...] f16, one small transfer
        self._table = (fresh if self._table is None
                       else jnp.concatenate([self._table, fresh], axis=0))
        if self._gather is None:
            self._gather = jax.jit(
                lambda t, r: t[r].astype(jnp.float32)
            )

    def featurize(self, get_images, indices, namespace: str = ""):
        """``get_images`` is a zero-arg callable so a warm cache never
        materializes (or device-round-trips) the image batch at all.
        ``namespace`` separates index spaces when one trainer mixes
        datasets (e.g. Flickr + CC in train_hyper_combine)."""
        keys = [(namespace, int(idx)) for idx in indices]
        missing = [i for i, k in enumerate(keys) if k not in self._store]
        if missing:
            # encode the WHOLE batch, not images[missing]: a varying
            # missing-count would compile a fresh encoder program per
            # distinct shape (30 s-10 min each through the relay)
            images = np.asarray(get_images())
            fresh = np.asarray(self._encode(self._params, images))
            new_rows = []
            for i in missing:
                if keys[i] in self._store:  # duplicate index in batch
                    continue
                self._store[keys[i]] = fresh[i].astype(np.float16)
                if self._device:
                    self._row[keys[i]] = len(self._row)
                    new_rows.append(self._store[keys[i]])
            if self._device and new_rows:
                self._append_device(np.stack(new_rows))
        if self._device:
            rows = np.asarray([self._row[k] for k in keys], np.int32)
            return self._gather(self._table, rows)  # device f32 [B, ...]
        return np.stack(
            [self._store[k] for k in keys]
        ).astype(np.float32)


class CaptionTrainer:
    def __init__(
        self,
        params,
        kind: str,  # 'gru' | 'hypernet'
        config: TrainConfig,
        vocab,
        encoder_params=None,
        embed_fn: Callable = style_token_embed,
        mesh=None,
        logger: Optional[MetricLogger] = None,
        run_name: str = "run",
        style_classifier_params=None,
    ):
        self.config = config
        self.vocab = vocab
        self.kind = kind
        self.mesh = mesh
        self.encoder_params = encoder_params
        self.logger = logger or MetricLogger(config.checkpoint_dir, run_name)
        self.tx = make_optimizer(config.lr, config.grad_clip)
        self.state = create_train_state(params, self.tx)
        self._embed_fn = embed_fn
        if kind == "gru":
            train_step, eval_step = make_gru_steps(
                self.tx, bf16=config.bf16_compute,
                unroll=config.scan_unroll,
                fused_scan=config.fused_scan,
            )
        else:
            train_step, eval_step = make_hypernet_steps(
                self.tx, embed_fn=embed_fn, bf16=config.bf16_compute,
                unroll=config.scan_unroll,
                fused_scan=config.fused_scan,
            )
            if config.mixup and config.style_aux:
                raise ValueError(
                    "mixup and style_aux are alternative auxiliary "
                    "objectives; enable at most one"
                )
            if config.style_aux:
                # style-identification aux loss (captionax extension —
                # see steps.make_hypernet_styleaux_steps): free-run
                # under the batch's own theta, frozen classifier must
                # recognize the style
                assert style_classifier_params is not None, (
                    "config.style_aux needs style_classifier_params "
                    "(train one: cli/train_classifier --kind small --save)"
                )
                from captionax.train.steps import (
                    make_hypernet_styleaux_steps,
                )

                if config.style_aux_split and mesh is not None:
                    raise ValueError(
                        "style_aux_split is single-device (its inner "
                        "jits bypass the mesh plumbing); drop one"
                    )
                aux_step = make_hypernet_styleaux_steps(
                    self.tx, style_classifier_params,
                    alpha=config.style_aux_alpha, embed_fn=embed_fn,
                    # None -> the probe class rides in batch['probe_cls']
                    # (combined Flickr+CC model, 4-class probe)
                    style_ids=None if config.style_aux_from_batch
                    else (0, 1, 2) if "style_embed" in params
                    else (4, 3, 6),
                    split=config.style_aux_split,
                )
                base_key = jax.random.PRNGKey(config.seed)

                def train_step(state, batch, _aux=aux_step, _key=base_key):
                    rng = jax.random.fold_in(_key, state.step)
                    return _aux(state, batch, rng)

                train_step._prejitted = getattr(aux_step, "_prejitted",
                                                False)
            if config.mixup:
                # mixup training (hypernet_attention.py:147-191): the
                # style-mixed free-running caption is scored by a FROZEN
                # small style classifier; rng is derived from the
                # optimizer step so the 2-arg (state, batch) jit
                # signature (and donation/mesh plumbing) is unchanged
                assert style_classifier_params is not None, (
                    "config.mixup needs style_classifier_params "
                    "(train one: cli/train_classifier --kind small --save)"
                )
                from captionax.train.steps import make_hypernet_mixup_steps

                if config.mixup_split and mesh is not None:
                    raise ValueError(
                        "mixup_split is single-device (its inner jits "
                        "bypass the mesh plumbing); drop one of the two"
                    )
                mix_step = make_hypernet_mixup_steps(
                    self.tx, style_classifier_params,
                    alpha=config.mixup_alpha, embed_fn=embed_fn,
                    # dedicated style table: mix rows 0/1/2 of it
                    # instead of the vocab-token rows
                    style_ids=(0, 1, 2) if "style_embed" in params
                    else (4, 3, 6),
                    split=config.mixup_split,
                )
                base_key = jax.random.PRNGKey(config.seed)

                def train_step(state, batch, _mix=mix_step, _key=base_key):
                    rng = jax.random.fold_in(_key, state.step)
                    return _mix(state, batch, rng)

                # split steps jit internally; an outer jit would rebuild
                # the fused graph the split exists to avoid
                train_step._prejitted = getattr(mix_step, "_prejitted",
                                                False)
        if mesh is not None:
            self._train_step = None  # jitted lazily with example batch
            self._raw_train_step = train_step
        else:
            self._train_step = (
                train_step if getattr(train_step, "_prejitted", False)
                else jax.jit(train_step, donate_argnums=(0,))
            )
            self._raw_train_step = train_step
        self._eval_step = jax.jit(eval_step)
        self._encode = jax.jit(
            lambda p, imgs: encoder_cnn(p, preprocess_images(imgs))
        )
        self.scheduler = PlateauScheduler(
            factor=config.plateau_factor,
            patience=config.plateau_patience,
            cooldown=config.plateau_cooldown,
        )
        self.checkpointer = BestCheckpointer(config.checkpoint_dir)
        self.feature_cache = (
            FeatureCache(self._encode, encoder_params,
                         device=config.cache_features_device)
            if (config.cache_features or config.cache_features_device)
            and encoder_params is not None else None
        )
        self.global_step = 0

    def maybe_resume(self, directory: Optional[str] = None) -> bool:
        """Restore params from the latest checkpoint if one exists
        (reference resume = load_from_checkpoint, test_hn.py:67)."""
        from captionax.train.checkpoint import latest_step, restore_checkpoint

        directory = directory or self.config.checkpoint_dir
        step = latest_step(directory)
        if step is None:
            return False
        params = restore_checkpoint(directory, like=self.state.params)
        self.state = self.state._replace(params=params)
        self.global_step = int(step)
        self.logger.log({"resumed_from_step": float(step)})
        return True

    # -- plumbing -------------------------------------------------------
    def _loader(self, batches, mesh=None) -> BatchLoader:
        # with an active feature cache, images stay host-side (a warm
        # cache never reads them; device_put would round-trip [B,224,
        # 224,3] through the relay for nothing)
        keys = (("features", "captions", "style_id", "domain_value",
                 "probe_cls")
                if self.feature_cache is not None
                else ("images", "captions", "features"))
        return BatchLoader(batches, mesh=mesh, device_keys=keys)

    def _featurize(self, batch: Dict) -> Dict:
        if "features" not in batch and "images" in batch:
            assert self.encoder_params is not None, "encoder params required"
            batch = dict(batch)
            if self.feature_cache is not None and "indices" in batch:
                batch["features"] = self.feature_cache.featurize(
                    lambda: batch["images"], batch["indices"],
                    namespace=str(batch.get("index_ns", "")),
                )
            else:
                batch["features"] = self._encode(
                    self.encoder_params, batch["images"]
                )
        return {k: v for k, v in batch.items() if k in DEVICE_BATCH_KEYS}

    def _get_train_step(self, example_batch):
        if self._train_step is None:
            self._train_step = jit_data_parallel(
                self._raw_train_step, self.mesh, example_batch
            )
        return self._train_step

    @property
    def params(self):
        return self.state.params

    def decoder_params(self):
        return self.params["decoder"] if self.kind != "gru" else self.params

    # -- LR finder ------------------------------------------------------
    def lr_find(
        self,
        train_batches: Callable[[int], Iterable[Dict]],
        num_training: int = 100,
        min_lr: float = 1e-6,
        max_lr: float = 1.0,
        beta: float = 0.98,
    ) -> Optional[float]:
        """Exponential LR sweep + steepest-descent suggestion — the
        pl.Trainer ``tune()``/``auto_lr_find`` step every reference
        trainer runs before fit (train_attention_gru.py:330-342).

        Runs up to ``num_training`` optimizer steps with the LR swept
        geometrically from ``min_lr`` to ``max_lr``, tracking the
        bias-corrected EWMA of the loss (Lightning's smoothing), stops
        early on divergence (smoothed loss > 4x best), then restores the
        pre-sweep state and installs the suggested LR."""
        import math

        from captionax.train.state import suggest_lr_from_sweep

        # host-side snapshot: the jitted step donates the state buffers,
        # so keeping device references would leave the snapshot invalid
        # after the first sweep step
        saved_state = jax.tree_util.tree_map(
            lambda x: np.asarray(x).copy() if hasattr(x, "shape") else x,
            self.state,
        )
        saved_step = self.global_step
        ratio = (max_lr / min_lr) ** (1.0 / max(num_training - 1, 1))
        lrs, losses = [], []
        avg, best = 0.0, float("inf")
        i = 0
        done = False
        epoch = 0
        while not done and i < num_training:
            got_batch = False
            for batch in self._loader(train_batches(epoch), mesh=self.mesh):
                got_batch = True
                lr = min_lr * (ratio ** i)
                self.state = set_lr(self.state, lr)
                db = self._featurize(batch)
                step_fn = self._get_train_step(db)
                self.state, metrics = step_fn(self.state, db)
                loss = float(metrics["train_loss"])
                avg = beta * avg + (1 - beta) * loss
                smoothed = avg / (1 - beta ** (len(losses) + 1))
                lrs.append(lr)
                losses.append(smoothed)
                if math.isfinite(smoothed):
                    best = min(best, smoothed)
                i += 1
                if i >= num_training or (
                    len(losses) > 10
                    and (not math.isfinite(smoothed) or smoothed > 4 * best)
                ):
                    done = True
                    break
            if not got_batch:
                break
            epoch += 1
        self.state = saved_state
        self.global_step = saved_step
        suggestion = suggest_lr_from_sweep(lrs, losses)
        if suggestion is not None:
            self.state = set_lr(self.state, suggestion)
            self.logger.log({"lr_find_suggestion": suggestion})
        return suggestion

    # -- loops ----------------------------------------------------------
    def fit(
        self,
        train_batches: Callable[[int], Iterable[Dict]],
        val_batches: Optional[Callable[[], Iterable[Dict]]] = None,
        epoch_end_metrics: Optional[Callable[[Any], Dict]] = None,
    ) -> Dict:
        """train_batches(epoch) / val_batches() yield host batch dicts.

        ``epoch_end_metrics(params) -> dict`` is an optional per-epoch
        hook; its scalars are logged with the epoch metrics and are
        eligible as the checkpoint-selection monitor
        (``config.select_metric`` / ``select_mode`` — Lightning
        ModelCheckpoint(monitor=...) equivalent, e.g. monitoring
        validation style separation for --style-aux runs)."""
        cfg = self.config
        history = {}
        if cfg.auto_lr_find:
            found = self.lr_find(train_batches,
                                 num_training=cfg.lr_find_steps)
            print(f"lr_find: suggested lr={found}")
        if cfg.trace_dir:
            from captionax.core.runtime import trace

            with trace(cfg.trace_dir):
                return self._fit_epochs(train_batches, val_batches, history,
                                        epoch_end_metrics)
        return self._fit_epochs(train_batches, val_batches, history,
                                epoch_end_metrics)

    def _fit_epochs(self, train_batches, val_batches, history,
                    epoch_end_metrics=None) -> Dict:
        cfg = self.config
        for epoch in range(cfg.max_epochs):
            t0 = time.time()
            n = 0
            # per-step losses stay ON DEVICE until the epoch ends: a
            # float() per step is a full dispatch->completion sync, and
            # through the axon relay that serializes every step against
            # the ~23-34 ms dispatch floor (measured 1.29x epoch
            # throughput from deferring, B=1024 bf16).  log_every steps
            # still sync — that is the intended bounded checkpointing of
            # progress (and keeps the deferred queue short).
            step_losses = []
            for batch in self._loader(train_batches(epoch), mesh=self.mesh):
                db = self._featurize(batch)
                step_fn = self._get_train_step(db)
                self.state, metrics = step_fn(self.state, db)
                self.global_step += 1
                n += 1
                step_losses.append(metrics["train_loss"])
                if self.global_step % cfg.log_every == 0:
                    # every scalar the step emitted (e.g. mixup/style-aux
                    # expose ce_loss + style_loss) — this sync is the
                    # intended bounded checkpoint of progress
                    self.logger.log(
                        {**{k: float(v) for k, v in metrics.items()},
                         "lr": get_lr(self.state), "epoch": epoch},
                        step=self.global_step,
                    )
            loss_sum = float(sum(float(x) for x in step_losses))
            if n == 0:
                raise RuntimeError(
                    f"epoch {epoch} produced ZERO training batches — "
                    "misconfigured data (e.g. batch_size larger than every "
                    "domain/style group, empty caption file, or an "
                    "over-restrictive index split)"
                )
            from captionax.core.runtime import host_rss_mb

            epoch_metrics = {
                "epoch": epoch,
                "train_loss_epoch": loss_sum / max(n, 1),
                "epoch_seconds": time.time() - t0,
                # flat across epochs <=> no per-step host->device feature
                # traffic (the relay leaks RSS per transferred byte)
                "rss_mb": host_rss_mb(),
            }
            if val_batches is not None:
                val = self.validate(
                    val_batches(),
                    with_quality_metrics=not cfg.skip_val_quality)
                epoch_metrics.update(val)
                lr = self.scheduler.step(val["val_loss_tf"], get_lr(self.state))
                if lr != get_lr(self.state):
                    self.state = set_lr(self.state, lr)
            if epoch_end_metrics is not None:
                epoch_metrics.update(epoch_end_metrics(self.params))
            monitored = epoch_metrics.get(cfg.select_metric)
            if monitored is not None:
                # BestCheckpointer is min-based; negate for mode="max"
                self.checkpointer.maybe_save(
                    float(monitored) if cfg.select_mode == "min"
                    else -float(monitored),
                    self.global_step, self.state.params,
                )
            self.logger.log(epoch_metrics, step=self.global_step)
            history[epoch] = epoch_metrics
        return history

    def validate(self, batches: Iterable[Dict],
                 with_quality_metrics: bool = True) -> Dict:
        n = 0
        quality = CaptionMetrics(self.vocab) if with_quality_metrics else None
        # loss scalars stay on device until the loop ends so eval
        # dispatches pipeline through the relay (same rationale as the
        # training loop's deferred fetch)
        losses = []
        for batch in self._loader(batches):
            db = self._featurize(batch)
            out = self._eval_step(self.params, db)
            losses.append((out["val_loss_tf"], out["val_loss"]))
            if quality is not None:
                quality.add_batch_logits(
                    np.asarray(db["captions"]), np.asarray(out["logits_tf"])
                )
            n += 1
        sums: Dict[str, float] = {
            "val_loss_tf": sum(float(a) for a, _ in losses),
            "val_loss": sum(float(b) for _, b in losses),
        }
        out = {k: v / max(n, 1) for k, v in sums.items()}
        if quality is not None and n:
            out.update({f"val_{k}": v for k, v in quality.compute().items()})
        return out

    def test_beam(self, batches: Iterable[Dict]) -> Dict:
        """Reference test_step: k-beam decode + metrics of the best
        hypothesis against the batch refs, plus TF metrics.

        Additionally reports corpus-level beam metrics (``beam_corpus_*``)
        over all decoded hypotheses — the reference's per-image
        metric_score_test cannot produce a meaningful CIDEr (corpus df
        over a single image is identically zero)."""
        cfg = self.config
        agg: Dict[str, float] = {}
        n_scored = 0
        tf_quality = CaptionMetrics(self.vocab)
        beam_quality = CaptionMetrics(self.vocab)

        @jax.jit
        def beam_step(params, features, theta):
            return beam_search(
                params, features, k=cfg.beam_size,
                max_steps=cfg.beam_max_steps, gru_params=theta,
            )

        from captionax.models.hypernet import hypernet_apply

        def process(res, out, caps):
            nonlocal n_scored
            found = np.asarray(res.found)
            toks = np.asarray(res.tokens)
            for i in range(len(found)):
                if not found[i]:
                    continue
                scores = metric_score_test(caps[i : i + 1], toks[i], self.vocab)
                for k, v in scores.items():
                    agg[f"beam_{k}"] = agg.get(f"beam_{k}", 0.0) + v
                n_scored += 1
            beam_quality.add_batch_ids(caps, toks)
            tf_quality.add_batch_logits(caps, np.asarray(out["logits_tf"]))

        # one-deep pipelining: dispatch batch i+1 before fetching batch
        # i's results, so the device decodes while the host computes
        # metric scores (and the per-dispatch relay floor hides)
        pending = None
        for batch in self._loader(batches):
            db = self._featurize(batch)
            if self.kind == "gru":
                decoder, theta = self.params, None
            else:
                decoder = self.params["decoder"]
                theta = hypernet_apply(
                    self.params["hn"], self._embed_fn(self.params, db)
                )
            res = beam_step(decoder, db["features"], theta)
            out = self._eval_step(self.params, db)
            if pending is not None:
                process(*pending)
            pending = (res, out, np.asarray(db["captions"]))
        if pending is not None:
            process(*pending)
        result = {k: v / max(n_scored, 1) for k, v in agg.items()}
        result.update({f"tf_{k}": v for k, v in tf_quality.compute().items()})
        result.update(
            {f"beam_corpus_{k}": v for k, v in beam_quality.compute().items()}
        )
        result["beam_completed"] = n_scored
        return result

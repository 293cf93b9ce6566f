"""Train the hypernet on combined FlickrStyle + Conceptual Captions.

Equivalent of ``python train_hyper_combine.py``
(/root/reference/train_hyper_combine.py:42-338): the Flickr styles join
the CC domain dictionary as pseudo-domains 'f'/'h'/'r'; batches are
whole-batch Flickr-or-CC; one domain-conditioned hypernet serves all.

Captionax extensions beyond the reference recipe (the plain recipe
conditions TF likelihoods but measurably NOT free-running decode —
benchmarks/_parity/combine_sep.json, r4):
- ``--style-aux`` + ``--style-classifier``: the 4-class (f/h/r/CC)
  style-identification auxiliary loss — free-run under the batch's own
  theta, a frozen probe must recognize the conditioning class (the
  probe class rides in batch['probe_cls']; TrainConfig
  .style_aux_from_batch).  The same objective moved pure-FlickrStyle
  separation 0.575 -> 0.99+ (BASELINE.md).  (The reference's own
  optional 4-way regularizer is the mixup loss against a 4-class BERT
  classifier, train_hyper_combine.py:147-200 — measured to COLLAPSE
  separation on pure FlickrStyle.)
- ``--select-sep-margin``: per-epoch checkpoint selection on the mean
  frozen-probe probability of the true class over beam-decoded
  validation captions under each conditioning (continuous,
  decode-matched — the Lightning ModelCheckpoint(monitor=...) pattern
  pointed at the metric the aux loss targets).
- ``--init-hn``: warm-start the hypernet from a distillation artifact
  (a train_init-style pretrain mapping the f/h/r conditioning
  embeddings to per-style trained GRUs — the reference's own
  pretrain-then-finetune design, train_init.py:70-123).

    python -m captionax.cli.train_hyper_combine --synthetic \
        --domain-scheme "one hot" --max-epochs 2
"""

from __future__ import annotations

import jax
import numpy as np

from captionax.cli.cc_train_hypernet import attach_domain_values
from captionax.cli.common import (
    build_encoder,
    build_hypernet_model,
    make_parser,
    maybe_load_glove,
    parse_configs,
    resolve_flickr_data,
    resolve_mesh,
    resolve_vocab,
)
from captionax.data.cc import ConceptualCaptionsData, domain_list, load_cc_captions
from captionax.data.combine import FLICKR_PSEUDO_DOMAINS, CombinedData, style_histograms
from captionax.data.domains import DomainEmbedder
from captionax.data.synthetic import synthetic_image
from captionax.train.harness import CaptionTrainer

# probe class per pseudo-domain; any real CC domain -> class 3
PROBE_CLS = {"f": 0, "h": 1, "r": 2}


def attach_probe_cls(batches):
    """Host-side: label each batch with its 4-class probe class
    (f/h/r -> 0/1/2, any CC domain -> 3) for the style-aux loss."""
    for batch in batches:
        batch = dict(batch)
        batch["probe_cls"] = np.int32(PROBE_CLS.get(batch["domain"], 3))
        yield batch


def main(argv=None):
    parser = make_parser(__doc__)
    parser.add_argument("--encoder-weights", type=str, default="")
    parser.add_argument("--style-classifier", type=str, default="",
                        help="pickled 4-class (f/h/r/CC) probe params "
                             "(e.g. benchmarks/combine_study.py --phase "
                             "probe); required with --style-aux/--mixup")
    parser.add_argument("--init-hn", type=str, default="",
                        help="warm-start the hypernet: a .pkl holding "
                             "{'hn': ...} (combine_study.py --phase "
                             "distill) or a checkpoint dir")
    parser.add_argument("--select-sep-margin", action="store_true",
                        help="checkpoint-select on per-epoch validation "
                             "separation margin (mean frozen-probe "
                             "probability of the true class over "
                             "beam-decoded val captions under each "
                             "conditioning); requires --style-classifier")
    parser.add_argument("--sep-probe-images", type=int, default=192)
    parser.add_argument("--sep-cc-conds", type=int, default=2,
                        help="CC domains included as conditionings in "
                             "the selection monitor (plus f/h/r)")
    parser.add_argument("--sep-max-steps", type=int, default=20)
    args = parser.parse_args(argv)
    model_cfg, train_cfg, data_cfg = parse_configs(args)
    if train_cfg.style_aux:
        # the combined model's aux class is batch-carried (4-class probe)
        train_cfg.style_aux_from_batch = True
    if args.select_sep_margin:
        train_cfg.select_metric = "val_sep_margin"
        train_cfg.select_mode = "max"

    vocab = resolve_vocab(data_cfg)
    model_cfg.vocab_size = len(vocab)
    flickr = resolve_flickr_data(data_cfg, vocab, train_cfg.max_len)
    rows = load_cc_captions(data_cfg.cc_captions)
    cc = ConceptualCaptionsData(rows, vocab, image_loader=synthetic_image,
                                max_len=train_cfg.max_len)
    combined = CombinedData(flickr, cc)
    cc_domains = domain_list(data_cfg.cc_captions)
    print(f"vocab={len(vocab)} flickr={len(flickr)} cc_rows={len(cc)} "
          f"domains={len(cc_domains)}+3 styles")

    embedder = DomainEmbedder(
        data_cfg.domain_scheme, vocab, cc_domains,
        hyper_emb=model_cfg.hyper_emb, cap_path=data_cfg.cc_captions,
        n_tsne=data_cfg.n_tsne,
        zero_shot_domains=list("fhr"),  # styles appended like zero-shot ids
    )
    if data_cfg.domain_scheme.startswith("histograme"):
        embedder.table.update(
            {k: np.asarray(v, np.float32)
             for k, v in style_histograms(flickr, vocab).items()}
        )

    key = jax.random.PRNGKey(train_cfg.seed)
    k1, k2, k3 = jax.random.split(key, 3)
    params = build_hypernet_model(model_cfg, vocab, k1,
                                  hyper_emb=embedder.hyper_emb)
    params["domain_emb"] = embedder.init_params(k3)
    params = maybe_load_glove(params, data_cfg, vocab, model_cfg.embed_size)
    if args.init_hn:
        if args.init_hn.endswith(".pkl"):
            import pickle

            with open(args.init_hn, "rb") as f:
                params["hn"] = pickle.load(f)["hn"]
        else:
            from captionax.train.checkpoint import restore_checkpoint

            params["hn"] = restore_checkpoint(args.init_hn,
                                              like=params)["hn"]
        print(f"hypernet warm-started from {args.init_hn}")
    encoder_params = build_encoder(model_cfg, k2, args.encoder_weights)
    embed_fn = lambda p, b: embedder.embed(p["domain_emb"], b["domain_value"])  # noqa: E731

    clf_params = None
    if train_cfg.mixup or train_cfg.style_aux or args.select_sep_margin:
        import pickle

        assert args.style_classifier, (
            "--mixup/--style-aux/--select-sep-margin require "
            "--style-classifier"
        )
        with open(args.style_classifier, "rb") as f:
            clf_params = pickle.load(f)

    trainer = CaptionTrainer(
        params, "hypernet", train_cfg, vocab,
        encoder_params=encoder_params, embed_fn=embed_fn,
        run_name=args.run_name, mesh=resolve_mesh(args),
        style_classifier_params=clf_params,
    )
    if args.resume:
        resumed = trainer.maybe_resume(args.resume if args.resume != "auto" else None)
        print(f"resumed={resumed}")
    fl_train, fl_val, fl_test = flickr.splits(seed=train_cfg.seed)
    cc_train, cc_val, cc_test = cc.split_by_domain(2, 2, seed=train_cfg.seed)

    sep_hook = None
    if args.select_sep_margin:
        import jax.numpy as jnp

        from captionax.decode.search import beam_search
        from captionax.models.classifiers import classifier_ids_apply_fn
        from captionax.models.hypernet import hypernet_apply

        clf_apply = classifier_ids_apply_fn(clf_params)
        # tiny datasets may have an empty val split — fall back to train
        probe_idx = (list(fl_val) or list(fl_train))[: args.sep_probe_images]
        probe_imgs = np.stack([flickr.image(i) for i in probe_idx])
        probe_feats = trainer._encode(encoder_params, probe_imgs)
        cc_pick = cc_domains[:: max(1, len(cc_domains)
                                    // max(args.sep_cc_conds, 1))][
            : args.sep_cc_conds]
        conds = [("f", 0), ("h", 1), ("r", 2)] + [(d, 3) for d in cc_pick]
        probe_T = 25  # the probe's trained caption length

        @jax.jit
        def _decode_probe(p, f_, domain_value):
            emb = embedder.embed(p["domain_emb"], domain_value)
            theta = hypernet_apply(p["hn"], emb)
            ids = beam_search(p["decoder"], f_, k=train_cfg.beam_size,
                              max_steps=args.sep_max_steps,
                              gru_params=theta).tokens
            padded = jnp.zeros((ids.shape[0], probe_T), jnp.int32)
            padded = padded.at[:, : min(probe_T, ids.shape[1] - 1)].set(
                ids[:, 1:][:, :probe_T])
            # small probe returns softmax probs already; the BERT kind
            # returns logits — normalize so the margin is a probability
            out = clf_apply(clf_params, padded)
            return out if "bert" not in clf_params else jax.nn.softmax(
                out, axis=-1)

        def sep_hook(p):
            true_prob, correct, total = 0.0, 0, 0
            for dom, cls in conds:
                dv = jnp.asarray(np.asarray(embedder.host_vector(dom)))
                probs = np.asarray(_decode_probe(p, probe_feats, dv))
                true_prob += float(probs[:, cls].sum())
                correct += int((probs.argmax(-1) == cls).sum())
                total += len(probs)
            return {"val_sep_margin": true_prob / max(total, 1),
                    "val_sep_acc": correct / max(total, 1)}

    history = trainer.fit(
        lambda epoch: attach_probe_cls(attach_domain_values(
            combined.batches(train_cfg.batch_size, seed=train_cfg.seed + epoch,
                             flickr_indices=fl_train, cc_indices=cc_train),
            embedder,
        )),
        lambda: attach_probe_cls(attach_domain_values(
            combined.batches(train_cfg.batch_size, seed=train_cfg.seed,
                             flickr_indices=fl_val, cc_indices=cc_val),
            embedder,
        )),
        epoch_end_metrics=sep_hook,
    )
    if args.select_sep_margin:
        # test-report the SELECTED checkpoint, not the final epoch
        from captionax.train.checkpoint import restore_checkpoint

        best = restore_checkpoint(train_cfg.checkpoint_dir,
                                  like=trainer.state.params)
        trainer.state = trainer.state._replace(params=best)
        print(f"selected checkpoint val_sep_margin="
              f"{-trainer.checkpointer.best:.4f}")
    res = trainer.test_beam(
        attach_probe_cls(attach_domain_values(
            combined.batches(train_cfg.batch_size, seed=0,
                             flickr_indices=fl_test, cc_indices=cc_test,
                             drop_remainder=False),
            embedder,
        ))
    )
    trainer.logger.log({f"test_{k}": v for k, v in res.items()})
    print({k: round(v, 4) for k, v in res.items()})
    return history


if __name__ == "__main__":
    main()

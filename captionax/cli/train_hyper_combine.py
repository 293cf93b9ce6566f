"""Train the hypernet on combined FlickrStyle + Conceptual Captions.

Equivalent of ``python train_hyper_combine.py``
(/root/reference/train_hyper_combine.py:42-338): the Flickr styles join
the CC domain dictionary as pseudo-domains 'f'/'h'/'r'; batches are
whole-batch Flickr-or-CC; one domain-conditioned hypernet serves all.
(The reference's optional 4-way mixup loss against a 4-class style
classifier mirrors the FlickrStyle 3-way mixup of
captionax.train.steps.make_hypernet_mixup_steps; enable similar behavior
by training with --mixup on the Flickr-only path.)

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
from captionax.data.combine import CombinedData, style_histograms
from captionax.data.domains import DomainEmbedder
from captionax.data.synthetic import synthetic_image
from captionax.train.harness import CaptionTrainer


def main(argv=None):
    parser = make_parser(__doc__)
    parser.add_argument("--encoder-weights", type=str, default="")
    args = parser.parse_args(argv)
    model_cfg, train_cfg, data_cfg = parse_configs(args)

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
    encoder_params = build_encoder(model_cfg, k2, args.encoder_weights)
    embed_fn = lambda p, b: embedder.embed(p["domain_emb"], b["domain_value"])  # noqa: E731

    trainer = CaptionTrainer(
        params, "hypernet", train_cfg, vocab,
        encoder_params=encoder_params, embed_fn=embed_fn,
        run_name=args.run_name, mesh=resolve_mesh(args),
    )
    if args.resume:
        resumed = trainer.maybe_resume(args.resume if args.resume != "auto" else None)
        print(f"resumed={resumed}")
    fl_train, fl_val, fl_test = flickr.splits(seed=train_cfg.seed)
    cc_train, cc_val, cc_test = cc.split_by_domain(2, 2, seed=train_cfg.seed)

    history = trainer.fit(
        lambda epoch: attach_domain_values(
            combined.batches(train_cfg.batch_size, seed=train_cfg.seed + epoch,
                             flickr_indices=fl_train, cc_indices=cc_train),
            embedder,
        ),
        lambda: attach_domain_values(
            combined.batches(train_cfg.batch_size, seed=train_cfg.seed,
                             flickr_indices=fl_val, cc_indices=cc_val),
            embedder,
        ),
    )
    res = trainer.test_beam(
        attach_domain_values(
            combined.batches(train_cfg.batch_size, seed=0,
                             flickr_indices=fl_test, cc_indices=cc_test),
            embedder,
        )
    )
    trainer.logger.log({f"test_{k}": v for k, v in res.items()})
    print({k: round(v, 4) for k, v in res.items()})
    return history


if __name__ == "__main__":
    main()

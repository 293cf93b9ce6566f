"""Evaluate a combined model over all five test sets.

Equivalent of ``python test_all.py`` (/root/reference/test_all.py:40-100):
beam-test a (combined) hypernet over factual / humour / romantic Flickr
styles, the CC test split, and the CC zero-shot domains.

    python -m captionax.cli.test_all --synthetic
"""

from __future__ import annotations

import jax

from captionax.cli.cc_train_hypernet import attach_domain_values
from captionax.cli.common import (
    build_encoder,
    build_hypernet_model,
    make_parser,
    parse_configs,
    resolve_flickr_data,
    resolve_vocab,
)
from captionax.data.cc import ConceptualCaptionsData, domain_list, load_cc_captions
from captionax.data.combine import FLICKR_PSEUDO_DOMAINS
from captionax.data.domains import DomainEmbedder
from captionax.data.synthetic import synthetic_image
from captionax.train.checkpoint import restore_checkpoint
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
    cc_domains = domain_list(data_cfg.cc_captions)
    import os

    zero_shot = (
        domain_list(data_cfg.cc_oneshot_captions)
        if os.path.exists(data_cfg.cc_oneshot_captions) else []
    )

    # Construct the embedder EXACTLY as train_hyper_combine does (styles
    # appended as pseudo-zero-shot ids, CC zero-shot domains excluded) so
    # the restored pytree shapes match the trained checkpoint; the unseen
    # domains are registered post-restore for the id-table schemes.
    id_scheme = data_cfg.domain_scheme in ("embedding", "one hot")
    embedder = DomainEmbedder(
        data_cfg.domain_scheme, vocab, cc_domains,
        hyper_emb=model_cfg.hyper_emb, cap_path=data_cfg.cc_captions,
        n_tsne=data_cfg.n_tsne,
        zero_shot_domains=list("fhr") + ([] if id_scheme else zero_shot),
        zero_shot_path=data_cfg.cc_oneshot_captions,
    )
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    params = build_hypernet_model(model_cfg, vocab, k1,
                                  hyper_emb=embedder.hyper_emb)
    params["domain_emb"] = embedder.init_params(k3)
    try:
        params = restore_checkpoint(train_cfg.checkpoint_dir, like=params)
        print(f"loaded {train_cfg.checkpoint_dir}")
    except FileNotFoundError:
        print("no checkpoint; evaluating random init")
    if zero_shot and id_scheme:
        params = dict(params)
        params["domain_emb"] = embedder.register_zero_shot(
            params["domain_emb"], zero_shot, key=k3)
    encoder_params = build_encoder(model_cfg, k2, args.encoder_weights)
    embed_fn = lambda p, b: embedder.embed(p["domain_emb"], b["domain_value"])  # noqa: E731
    trainer = CaptionTrainer(
        params, "hypernet", train_cfg, vocab,
        encoder_params=encoder_params, embed_fn=embed_fn,
        run_name=args.run_name + "_all",
    )

    _, _, fl_test = flickr.splits(seed=train_cfg.seed)
    _, _, cc_test = cc.split_by_domain(2, 2, seed=train_cfg.seed)
    results = {}

    def flickr_with_domains(style):
        for b in flickr.batches(fl_test, train_cfg.batch_size, style=style,
                                seed=0, shuffle=False, drop_remainder=False):
            b["domain"] = FLICKR_PSEUDO_DOMAINS[style]
            yield b

    for style in ("factual", "humour", "romantic"):
        results[style] = trainer.test_beam(
            attach_domain_values(flickr_with_domains(style), embedder)
        )
    results["cc"] = trainer.test_beam(
        attach_domain_values(
            cc.batches(train_cfg.batch_size, seed=0, indices=cc_test,
                       drop_remainder=False),
            embedder,
        )
    )
    if zero_shot and os.path.exists(data_cfg.cc_oneshot_captions):
        zs = ConceptualCaptionsData(
            load_cc_captions(data_cfg.cc_oneshot_captions), vocab,
            image_loader=synthetic_image, max_len=train_cfg.max_len,
        )
        results["cc_zero_shot"] = trainer.test_beam(
            attach_domain_values(
                zs.batches(train_cfg.batch_size, seed=0, drop_remainder=False),
                embedder,
            )
        )
    for name, res in results.items():
        print(name, {k: round(v, 4) for k, v in res.items()})
    return results


if __name__ == "__main__":
    main()

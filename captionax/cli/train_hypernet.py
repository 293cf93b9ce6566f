"""Train the FlickrStyle hypernet captioner.

Equivalent of ``python hypernet_attention.py`` / ``train_captioning.py``
(/root/reference/hypernet_attention.py:353-456): random per-batch style,
CE on teacher-forced logits, plateau LR on TF val loss, top-1 checkpoint,
then beam-search test per style.

    python -m captionax.cli.train_hypernet --synthetic --max-epochs 2
"""

from __future__ import annotations

import jax

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
from captionax.train.harness import CaptionTrainer


def main(argv=None):
    parser = make_parser(__doc__)
    parser.add_argument("--encoder-weights", type=str, default="",
                        help="torchvision resnet state_dict (.pt) to fold")
    parser.add_argument("--style-classifier", type=str, default="",
                        help="pickled style classifier params, small OR "
                             "bert (cli/train_classifier --kind small|"
                             "style3 --save) — the probe kind is "
                             "auto-detected from the pytree; required "
                             "with --mixup / --style-aux")
    parser.add_argument("--init-hn", type=str, default="",
                        help="warm-start the hypernet from a train_init "
                             "distillation checkpoint dir (the reference's "
                             "pretrain-then-finetune flow, train_init.py:"
                             "70-123); composed with --style-aux it is the "
                             "measured best style-separation recipe "
                             "(BASELINE.md seed-sensitivity paragraph)")
    args = parser.parse_args(argv)
    model_cfg, train_cfg, data_cfg = parse_configs(args)

    vocab = resolve_vocab(data_cfg)
    model_cfg.vocab_size = len(vocab)
    data = resolve_flickr_data(data_cfg, vocab, train_cfg.max_len)
    data.dedicated_style_tokens = model_cfg.dedicated_style_tokens
    print(f"vocab={len(vocab)} images={len(data)}")

    key = jax.random.PRNGKey(train_cfg.seed)
    k1, k2 = jax.random.split(key)
    params = build_hypernet_model(model_cfg, vocab, k1)
    params = maybe_load_glove(params, data_cfg, vocab, model_cfg.embed_size)
    if args.init_hn:
        # only the hn is distilled; the decoder keeps this run's init
        from captionax.train.checkpoint import restore_checkpoint

        params["hn"] = restore_checkpoint(args.init_hn, like=params)["hn"]
        print(f"hypernet warm-started from {args.init_hn}")
    encoder_params = build_encoder(model_cfg, k2, args.encoder_weights)

    clf_params = None
    if train_cfg.mixup or train_cfg.style_aux:
        import pickle

        assert args.style_classifier, (
            "--mixup/--style-aux require --style-classifier"
        )
        with open(args.style_classifier, "rb") as f:
            clf_params = pickle.load(f)

    from captionax.train.steps import dedicated_style_embed, style_token_embed

    trainer = CaptionTrainer(
        params, "hypernet", train_cfg, vocab,
        encoder_params=encoder_params, run_name=args.run_name,
        style_classifier_params=clf_params,
        mesh=resolve_mesh(args),
        embed_fn=dedicated_style_embed if model_cfg.dedicated_style_tokens
        else style_token_embed,
    )
    if args.resume:
        resumed = trainer.maybe_resume(args.resume if args.resume != "auto" else None)
        print(f"resumed={resumed}")
    train_idx, val_idx, test_idx = data.splits(seed=train_cfg.seed)

    history = trainer.fit(
        lambda epoch: data.batches(
            train_idx, train_cfg.batch_size, style="random",
            seed=train_cfg.seed + epoch,
        ),
        lambda: data.batches(
            val_idx, train_cfg.batch_size, style="random",
            seed=train_cfg.seed, shuffle=False, drop_remainder=False,
        ),
    )
    # per-style beam test, mirroring the reference's three test loaders
    for style in ("factual", "humour", "romantic"):
        res = trainer.test_beam(
            data.batches(
                test_idx, train_cfg.batch_size, style=style,
                seed=0, shuffle=False, drop_remainder=False,
            )
        )
        trainer.logger.log({f"test_{style}_{k}": v for k, v in res.items()})
        print(style, {k: round(v, 4) for k, v in res.items()})
    return history


if __name__ == "__main__":
    main()

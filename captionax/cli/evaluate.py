"""Evaluate a trained checkpoint with beam search (test_hn / test_gru
equivalents, /root/reference/test_hn.py:37-85, test_gru.py:33-63).

    python -m captionax.cli.evaluate --checkpoint-dir ckpts --kind hypernet \
        --synthetic
"""

from __future__ import annotations

import jax

from captionax.cli.common import (
    build_captioner,
    build_encoder,
    build_hypernet_model,
    make_parser,
    parse_configs,
    resolve_flickr_data,
    resolve_vocab,
)
from captionax.train.checkpoint import restore_checkpoint
from captionax.train.harness import CaptionTrainer


def main(argv=None):
    parser = make_parser(__doc__)
    parser.add_argument("--kind", type=str, default="hypernet",
                        choices=["gru", "hypernet"])
    parser.add_argument("--styles", type=str,
                        default="factual,humour,romantic")
    parser.add_argument("--encoder-weights", type=str, default="")
    args = parser.parse_args(argv)
    model_cfg, train_cfg, data_cfg = parse_configs(args)

    vocab = resolve_vocab(data_cfg)
    model_cfg.vocab_size = len(vocab)
    data = resolve_flickr_data(data_cfg, vocab, train_cfg.max_len)
    data.dedicated_style_tokens = model_cfg.dedicated_style_tokens

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    like = (
        build_captioner(model_cfg, vocab, k1)
        if args.kind == "gru"
        else build_hypernet_model(model_cfg, vocab, k1)
    )
    params = restore_checkpoint(train_cfg.checkpoint_dir, like=like)
    encoder_params = build_encoder(model_cfg, k2, args.encoder_weights)

    from captionax.train.steps import dedicated_style_embed, style_token_embed

    trainer = CaptionTrainer(
        params, args.kind, train_cfg, vocab,
        encoder_params=encoder_params, run_name=args.run_name + "_eval",
        embed_fn=dedicated_style_embed if model_cfg.dedicated_style_tokens
        else style_token_embed,
    )
    _, _, test_idx = data.splits(seed=train_cfg.seed)
    results = {}
    for style in args.styles.split(","):
        res = trainer.test_beam(
            data.batches(test_idx, train_cfg.batch_size, style=style,
                         seed=0, shuffle=False, drop_remainder=False)
        )
        results[style] = res
        print(style, {k: round(v, 4) for k, v in res.items()})
    return results


if __name__ == "__main__":
    main()

"""Train the plain attention-GRU captioner (single style).

Equivalent of ``python train_attention_gru.py`` / ``train_gru.py``
(/root/reference/train_attention_gru.py:265-344): fixed-style batches
(default factual via flickr_collate_style), CE loss, plateau LR, top-1
checkpoint, beam test.

    python -m captionax.cli.train_gru --synthetic --max-epochs 2
"""

from __future__ import annotations

import jax

from captionax.cli.common import (
    build_captioner,
    build_encoder,
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
    parser.add_argument("--style", type=str, default="factual",
                        choices=["factual", "humour", "romantic"])
    parser.add_argument("--encoder-weights", type=str, default="")
    args = parser.parse_args(argv)
    model_cfg, train_cfg, data_cfg = parse_configs(args)

    vocab = resolve_vocab(data_cfg)
    model_cfg.vocab_size = len(vocab)
    data = resolve_flickr_data(data_cfg, vocab, train_cfg.max_len)
    print(f"vocab={len(vocab)} images={len(data)} style={args.style}")

    key = jax.random.PRNGKey(train_cfg.seed)
    k1, k2 = jax.random.split(key)
    params = build_captioner(model_cfg, vocab, k1)
    params = maybe_load_glove({"decoder": params}, data_cfg, vocab,
                              model_cfg.embed_size)["decoder"]
    encoder_params = build_encoder(model_cfg, k2, args.encoder_weights)

    trainer = CaptionTrainer(
        params, "gru", train_cfg, vocab,
        encoder_params=encoder_params, run_name=args.run_name,
        mesh=resolve_mesh(args),
    )
    if args.resume:
        resumed = trainer.maybe_resume(args.resume if args.resume != "auto" else None)
        print(f"resumed={resumed}")
    train_idx, val_idx, test_idx = data.splits(seed=train_cfg.seed)
    history = trainer.fit(
        lambda epoch: data.batches(
            train_idx, train_cfg.batch_size, style=args.style,
            seed=train_cfg.seed + epoch,
        ),
        lambda: data.batches(
            val_idx, train_cfg.batch_size, style=args.style,
            seed=train_cfg.seed, shuffle=False, drop_remainder=False,
        ),
    )
    res = trainer.test_beam(
        data.batches(test_idx, train_cfg.batch_size, style=args.style,
                     seed=0, shuffle=False, drop_remainder=False)
    )
    trainer.logger.log({f"test_{k}": v for k, v in res.items()})
    print({k: round(v, 4) for k, v in res.items()})
    return history


if __name__ == "__main__":
    main()

"""Train a plain (non-hypernet) attention-GRU captioner on Conceptual
Captions.

Equivalent of ``python cc_train_gru.py`` (/root/reference/cc_train_gru.py:
43-163, tested by test_gru.py): domains are ignored by the model — this is
the single-style CC baseline the domain-hypernet is compared against.

    python -m captionax.cli.cc_train_gru --synthetic --max-epochs 2
"""

from __future__ import annotations

import jax

from captionax.cli.common import (
    build_captioner,
    build_encoder,
    make_parser,
    maybe_load_glove,
    parse_configs,
    resolve_mesh,
    resolve_vocab,
)
from captionax.data.cc import ConceptualCaptionsData, load_cc_captions
from captionax.data.synthetic import synthetic_image
from captionax.train.harness import CaptionTrainer


def main(argv=None):
    parser = make_parser(__doc__)
    parser.add_argument("--encoder-weights", type=str, default="")
    args = parser.parse_args(argv)
    model_cfg, train_cfg, data_cfg = parse_configs(args)

    vocab = resolve_vocab(data_cfg)
    model_cfg.vocab_size = len(vocab)
    rows = load_cc_captions(data_cfg.cc_captions)
    data = ConceptualCaptionsData(
        rows, vocab,
        image_loader=synthetic_image if data_cfg.synthetic else None,
        max_len=train_cfg.max_len,
    )
    print(f"vocab={len(vocab)} rows={len(data)} domains={len(data.domains)}")

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
    train_idx, val_idx, test_idx = data.split_by_domain(2, 2, seed=train_cfg.seed)
    history = trainer.fit(
        lambda epoch: data.batches(train_cfg.batch_size,
                                   seed=train_cfg.seed + epoch,
                                   indices=train_idx),
        lambda: data.batches(train_cfg.batch_size, seed=0, indices=val_idx,
                             drop_remainder=False),
    )
    res = trainer.test_beam(
        data.batches(train_cfg.batch_size, seed=0, indices=test_idx,
                     drop_remainder=False)
    )
    trainer.logger.log({f"test_{k}": v for k, v in res.items()})
    print({k: round(v, 4) for k, v in res.items()})
    return history


if __name__ == "__main__":
    main()

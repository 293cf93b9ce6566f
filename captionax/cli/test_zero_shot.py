"""Zero-shot domain-transfer evaluation.

Equivalent of ``python test_zero_shot.py`` (/root/reference/
test_zero_shot.py:37-81): load a CC-hypernet checkpoint with
``zero_shot=True`` — unseen domains get one-hot ids >= 100 or appended
histogram/t-SNE rows — and beam-test over the one-shot caption file's
domains, captioning domains never seen in training.

    python -m captionax.cli.test_zero_shot --synthetic \
        --cc-oneshot-captions data/one_shot_captions.txt
"""

from __future__ import annotations

import jax

from captionax.cli.cc_train_hypernet import (
    attach_domain_values,
    build_cc_model_and_embedder,
)
from captionax.cli.common import (
    build_encoder,
    make_parser,
    parse_configs,
    resolve_vocab,
)
from captionax.data.cc import ConceptualCaptionsData, domain_list, load_cc_captions
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
    zero_shot_domains = domain_list(data_cfg.cc_oneshot_captions)
    print(f"zero-shot domains: {zero_shot_domains}")

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    params, embedder, embed_fn = build_cc_model_and_embedder(
        model_cfg, data_cfg, vocab, k1, zero_shot_domains=zero_shot_domains
    )
    try:
        params = restore_checkpoint(train_cfg.checkpoint_dir, like=params)
    except FileNotFoundError:
        print("no checkpoint found; evaluating the random-init model")
    encoder_params = build_encoder(model_cfg, k2, args.encoder_weights)

    rows = load_cc_captions(data_cfg.cc_oneshot_captions)
    data = ConceptualCaptionsData(
        rows, vocab,
        image_loader=synthetic_image if data_cfg.synthetic else None,
        max_len=train_cfg.max_len,
    )
    trainer = CaptionTrainer(
        params, "hypernet", train_cfg, vocab,
        encoder_params=encoder_params, embed_fn=embed_fn,
        run_name=args.run_name + "_zeroshot",
    )
    res = trainer.test_beam(
        attach_domain_values(
            data.batches(train_cfg.batch_size, seed=0, drop_remainder=False),
            embedder,
        )
    )
    print({k: round(v, 4) for k, v in res.items()})
    return res


if __name__ == "__main__":
    main()

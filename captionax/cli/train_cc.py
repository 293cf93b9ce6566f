"""Train the URL-streaming CC hypernet (train_cc.py equivalent).

Reference /root/reference/train_cc.py:39-330: GCC TSV rows, domains fixed
to 9 hosting sites, images fetched over HTTP per sample (here: in the
prefetch thread, with deterministic fallbacks — see
captionax.data.cc_stream).  Use ``--fetch`` only in environments with
network egress.

    python -m captionax.cli.train_cc --gcc-tsv data/gcc.tsv --max-epochs 1
"""

from __future__ import annotations

import jax

from captionax.cli.cc_train_hypernet import attach_domain_values
from captionax.cli.common import (
    build_encoder,
    build_hypernet_model,
    make_parser,
    parse_configs,
    resolve_mesh,
    resolve_vocab,
)
from captionax.data.cc_stream import (
    DEFAULT_SITES,
    StreamingCC,
    http_fetcher,
    load_gcc_tsv,
)
from captionax.data.domains import DomainEmbedder
from captionax.train.harness import CaptionTrainer


def main(argv=None):
    parser = make_parser(__doc__)
    parser.add_argument("--gcc-tsv", type=str, required=True)
    parser.add_argument("--fetch", action="store_true",
                        help="fetch images over HTTP (needs egress)")
    parser.add_argument("--limit", type=int, default=5000)
    parser.add_argument("--encoder-weights", type=str, default="")
    args = parser.parse_args(argv)
    model_cfg, train_cfg, data_cfg = parse_configs(args)

    vocab = resolve_vocab(data_cfg)
    model_cfg.vocab_size = len(vocab)
    rows = load_gcc_tsv(args.gcc_tsv, limit=args.limit)
    data = StreamingCC(
        rows, vocab,
        fetcher=http_fetcher() if args.fetch else None,
        max_len=train_cfg.max_len,
    )
    print(f"vocab={len(vocab)} rows={len(rows)} "
          f"domains={sorted(data.by_domain)} fetch={args.fetch}")

    embedder = DomainEmbedder("one hot", vocab, list(DEFAULT_SITES),
                              hyper_emb=model_cfg.hyper_emb)
    key = jax.random.PRNGKey(train_cfg.seed)
    k1, k2, k3 = jax.random.split(key, 3)
    params = build_hypernet_model(model_cfg, vocab, k1,
                                  hyper_emb=embedder.hyper_emb)
    params["domain_emb"] = embedder.init_params(k3)
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
    history = trainer.fit(
        lambda epoch: attach_domain_values(
            data.batches(train_cfg.batch_size, seed=train_cfg.seed + epoch),
            embedder,
        ),
        None,
    )
    print("done:", {k: round(v["train_loss_epoch"], 4) for k, v in history.items()})
    return history


if __name__ == "__main__":
    main()

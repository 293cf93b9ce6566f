"""Train the Conceptual-Captions domain-conditioned hypernet.

Equivalent of ``python cc_train_hypernet.py``
(/root/reference/cc_train_hypernet.py:361-409): domain-homogeneous
batches, one of six domain-embedding schemes conditioning the hypernet,
zero-shot domain support (test with captionax.cli.test_zero_shot).

    python -m captionax.cli.cc_train_hypernet --synthetic \
        --domain-scheme "one hot" --max-epochs 2
"""

from __future__ import annotations

import os

import jax
import numpy as np

from captionax.cli.common import (
    build_encoder,
    build_hypernet_model,
    make_parser,
    maybe_load_glove,
    parse_configs,
    resolve_mesh,
    resolve_vocab,
)
from captionax.data.cc import ConceptualCaptionsData, domain_list, load_cc_captions
from captionax.data.domains import DomainEmbedder
from captionax.data.synthetic import synthetic_image
from captionax.train.harness import CaptionTrainer


def attach_domain_values(batches, embedder):
    """Host-side: turn the batch's domain string into the device value the
    jitted step consumes (id or histogram/tsne vector)."""
    for batch in batches:
        batch = dict(batch)
        batch["domain_value"] = np.asarray(embedder.host_vector(batch["domain"]))
        yield batch


def build_cc_model_and_embedder(model_cfg, data_cfg, vocab, key, zero_shot_domains=()):
    domains = domain_list(data_cfg.cc_captions)
    embedder = DomainEmbedder(
        data_cfg.domain_scheme, vocab, domains,
        hyper_emb=model_cfg.hyper_emb, cap_path=data_cfg.cc_captions,
        n_tsne=data_cfg.n_tsne,
        zero_shot_domains=zero_shot_domains,
        zero_shot_path=data_cfg.cc_oneshot_captions,
    )
    k1, k2 = jax.random.split(key)
    params = build_hypernet_model(model_cfg, vocab, k1, hyper_emb=embedder.hyper_emb)
    params["domain_emb"] = embedder.init_params(k2)
    embed_fn = lambda p, b: embedder.embed(p["domain_emb"], b["domain_value"])  # noqa: E731
    return params, embedder, embed_fn


def main(argv=None):
    parser = make_parser(__doc__)
    parser.add_argument("--encoder-weights", type=str, default="")
    args = parser.parse_args(argv)
    model_cfg, train_cfg, data_cfg = parse_configs(args)

    vocab = resolve_vocab(data_cfg)
    model_cfg.vocab_size = len(vocab)
    rows = load_cc_captions(data_cfg.cc_captions)
    image_loader = synthetic_image if data_cfg.synthetic else None
    if image_loader is None:
        img_dir = os.path.dirname(data_cfg.cc_captions)
        from captionax.data.native_image import GRAY_VIRIDIS, make_file_loader

        # grayscale->viridis inside the decoder, before resize (the
        # reference's cc_dataloader.py:92-100 order)
        image_loader = make_file_loader(img_dir, gray_mode=GRAY_VIRIDIS)
    data = ConceptualCaptionsData(rows, vocab, image_loader=image_loader,
                                  max_len=train_cfg.max_len)
    print(f"vocab={len(vocab)} rows={len(data)} domains={len(data.domains)} "
          f"scheme={data_cfg.domain_scheme!r}")

    key = jax.random.PRNGKey(train_cfg.seed)
    k1, k2 = jax.random.split(key)
    params, embedder, embed_fn = build_cc_model_and_embedder(
        model_cfg, data_cfg, vocab, k1
    )
    params = maybe_load_glove(params, data_cfg, vocab, model_cfg.embed_size)
    encoder_params = build_encoder(model_cfg, k2, args.encoder_weights)

    trainer = CaptionTrainer(
        params, "hypernet", train_cfg, vocab,
        encoder_params=encoder_params, embed_fn=embed_fn,
        run_name=args.run_name, mesh=resolve_mesh(args),
    )
    if args.resume:
        resumed = trainer.maybe_resume(args.resume if args.resume != "auto" else None)
        print(f"resumed={resumed}")
    train_idx, val_idx, test_idx = data.split_by_domain(2, 2, seed=train_cfg.seed)
    history = trainer.fit(
        lambda epoch: attach_domain_values(
            data.batches(train_cfg.batch_size, seed=train_cfg.seed + epoch,
                         indices=train_idx),
            embedder,
        ),
        lambda: attach_domain_values(
            data.batches(train_cfg.batch_size, seed=train_cfg.seed,
                         indices=val_idx, drop_remainder=False),
            embedder,
        ),
    )
    res = trainer.test_beam(
        attach_domain_values(
            data.batches(train_cfg.batch_size, seed=0, indices=test_idx,
                         drop_remainder=False),
            embedder,
        )
    )
    trainer.logger.log({f"test_{k}": v for k, v in res.items()})
    print({k: round(v, 4) for k, v in res.items()})
    return history


if __name__ == "__main__":
    main()

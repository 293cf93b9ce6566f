"""The comparison the reference's CC design exists to make: does domain
conditioning beat an unconditioned GRU on Conceptual Captions?

Both sides train on the IDENTICAL corpus/seed/budget — the reference's
200_conceptual_train.txt (150 domains) with windows/9gag/twincities held
out as zero-shot (the r01 protocol), synthetic images over the real
caption text, 10 epochs at B=128:
- baseline: plain attention-GRU, domains ignored
  (/root/reference/cc_train_gru.py:43-163, evaluated by test_gru.py);
- hypernet: domain-conditioned theta, "embedding" scheme
  (/root/reference/cc_train_hypernet.py:361-409, test_zero_shot.py).

Outputs a side-by-side table (seen-domain test split, 2 captions/domain,
and the 300-caption zero-shot file) -> BASELINE.md.

Usage:
    python benchmarks/cc_gru_vs_hypernet.py --phase all [--epochs 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_parity")
CC_PATH = "/root/reference/data/200_conceptual_train.txt"
ZS_DOMAINS = ("windows", "9gag", "twincities")


def split_files(workdir):
    """Write seen/zero-shot caption files (the reference keeps one-shot
    domains in a separate file, test_zero_shot.py:42-44)."""
    seen_p = os.path.join(workdir, "cc_seen.txt")
    zs_p = os.path.join(workdir, "cc_zeroshot.txt")
    if not (os.path.exists(seen_p) and os.path.exists(zs_p)):
        seen, zs = [], []
        for line in open(CC_PATH):
            parts = line.rstrip("\n").split("     ")
            (zs if len(parts) >= 3 and parts[2].strip() in ZS_DOMAINS
             else seen).append(line)
        open(seen_p, "w").writelines(seen)
        open(zs_p, "w").writelines(zs)
    return seen_p, zs_p


def build(args, kind):
    from captionax.cli.cc_train_hypernet import (
        attach_domain_values,
        build_cc_model_and_embedder,
    )
    from captionax.cli.common import build_captioner, build_encoder
    from captionax.core.config import DataConfig, ModelConfig, TrainConfig
    from captionax.core.vocab import load_vocab_pickle
    from captionax.data.cc import ConceptualCaptionsData, load_cc_captions
    from captionax.data.synthetic import synthetic_image
    from captionax.train.harness import CaptionTrainer
    import jax

    seen_p, zs_p = split_files(OUT_DIR)
    vocab = load_vocab_pickle("/root/reference/data/vocab.pkl")
    model_cfg = ModelConfig(vocab_size=len(vocab))
    data_cfg = DataConfig(cc_captions=seen_p, cc_oneshot_captions=zs_p,
                          synthetic=True, domain_scheme=args.scheme)
    train_cfg = TrainConfig(
        lr=args.lr, batch_size=args.batch_size, max_epochs=args.epochs,
        seed=args.seed,
        checkpoint_dir=os.path.join(OUT_DIR, f"ckpt_ccab_{kind}"),
        # device table: leak-proof (relay RSS leak rides host->device
        # transfers; see CLAUDE.md) and ~7x warm epochs vs re-encoding
        cache_features_device=True,
    )
    model_cfg.encoder_depth = args.encoder_depth
    rows = load_cc_captions(seen_p)
    if args.limit:  # smoke-scale: first N rows per domain
        per = {}
        kept = []
        for r in rows:
            if per.setdefault(r[2], 0) < args.limit:
                per[r[2]] += 1
                kept.append(r)
        rows = kept
    data = ConceptualCaptionsData(rows, vocab, image_loader=synthetic_image,
                                  max_len=train_cfg.max_len)
    zs_rows = load_cc_captions(zs_p)
    if args.limit:
        zs_rows = zs_rows[: args.limit * len(ZS_DOMAINS)]
    zs_data = ConceptualCaptionsData(zs_rows, vocab,
                                     image_loader=synthetic_image,
                                     max_len=train_cfg.max_len)
    key = jax.random.PRNGKey(train_cfg.seed)
    k1, k2 = jax.random.split(key)
    if kind == "gru":
        params = build_captioner(model_cfg, vocab, k1)
        embedder, embed_fn = None, None
        trainer = CaptionTrainer(
            params, "gru", train_cfg, vocab,
            encoder_params=build_encoder(model_cfg, k2),
            run_name=f"ccab_{kind}")
    else:
        params, embedder, embed_fn = build_cc_model_and_embedder(
            model_cfg, data_cfg, vocab, k1, zero_shot_domains=ZS_DOMAINS)
        trainer = CaptionTrainer(
            params, "hypernet", train_cfg, vocab,
            encoder_params=build_encoder(model_cfg, k2),
            embed_fn=embed_fn, run_name=f"ccab_{kind}")
    return (trainer, data, zs_data, train_cfg, embedder,
            attach_domain_values)


def run_side(args, kind, shared_cache=None):
    trainer, data, zs_data, train_cfg, embedder, attach = build(args, kind)
    if shared_cache is not None and trainer.feature_cache is not None:
        # both sides encode the IDENTICAL synthetic images with the
        # IDENTICAL encoder (same seed -> same k2 -> same params), so the
        # frozen-feature table is shared: the second side starts fully
        # warm instead of re-paying the epoch-0 encode of the whole
        # corpus through the relay (~1 h at 7.6k images, ResNet-152)
        trainer.feature_cache = shared_cache
    maybe = (lambda b: attach(b, embedder)) if embedder is not None else (
        lambda b: b)
    train_idx, val_idx, test_idx = data.split_by_domain(2, 2,
                                                        seed=train_cfg.seed)
    t0 = time.time()
    history = trainer.fit(
        lambda epoch: maybe(data.batches(train_cfg.batch_size,
                                         seed=train_cfg.seed + epoch,
                                         indices=train_idx)),
        lambda: maybe(data.batches(train_cfg.batch_size, seed=0,
                                   indices=val_idx, drop_remainder=False)),
    )
    out = {"history": {k: {m: float(v) for m, v in h.items()}
                       for k, h in history.items()},
           "train_seconds": time.time() - t0}
    seen = trainer.test_beam(
        maybe(data.batches(train_cfg.batch_size, seed=0, indices=test_idx,
                           drop_remainder=False)))
    out["seen_test"] = {k: float(v) for k, v in seen.items()}
    zs = trainer.test_beam(
        maybe(zs_data.batches(train_cfg.batch_size, seed=0,
                              drop_remainder=False)))
    out["zero_shot"] = {k: float(v) for k, v in zs.items()}
    path = os.path.join(OUT_DIR, f"cc_ab_{kind}{args.tag}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    for split in ("seen_test", "zero_shot"):
        print(kind, split, {k: round(v, 4) for k, v in out[split].items()
                            if "cider" in k or "bleu1" in k or "completed" in k},
              flush=True)
    return out, trainer.feature_cache


def phase_report(args):
    rows = {}
    for kind in ("gru", "hypernet"):
        path = os.path.join(OUT_DIR, f"cc_ab_{kind}{args.tag}.json")
        if os.path.exists(path):
            rows[kind] = json.load(open(path))
    print("== CC: unconditioned GRU vs domain hypernet (identical "
          "data/seed/budget) ==")
    for split in ("seen_test", "zero_shot"):
        for metric in ("tf_bleu1", "tf_cider", "beam_bleu1",
                       "beam_corpus_cider", "beam_completed"):
            vals = {k: r.get(split, {}).get(metric) for k, r in rows.items()}
            if all(v is not None for v in vals.values()) and len(vals) == 2:
                print(f"{split:10s} {metric:18s} gru={vals['gru']:.4f} "
                      f"hypernet={vals['hypernet']:.4f} "
                      f"delta={vals['hypernet'] - vals['gru']:+.4f}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--lr", type=float, default=5e-3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--scheme", default="embedding")
    p.add_argument("--tag", default="")
    p.add_argument("--limit", type=int, default=0,
                   help="smoke-scale: keep N rows per domain (0 = all)")
    p.add_argument("--encoder-depth", type=int, default=152)
    p.add_argument("--phase", default="all",
                   choices=["all", "gru", "hypernet", "report"])
    p.add_argument("--platform", default="default",
                   choices=["default", "cpu"])
    args = p.parse_args(argv)
    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        from captionax.core.runtime import setup_runtime

        setup_runtime()
    os.makedirs(OUT_DIR, exist_ok=True)
    cache = None
    if args.phase in ("all", "gru"):
        _, cache = run_side(args, "gru")
    if args.phase in ("all", "hypernet"):
        run_side(args, "hypernet", shared_cache=cache)
    phase_report(args)


if __name__ == "__main__":
    main()

"""Style separation of the 3-style FlickrStyle hypernet, measured.

The flagship capability (/root/reference/hypernet_attention.py) is ONE
set of decoder weights per style, synthesized by the hypernet from the
style token embedding.  "Does the style conditioning do anything?" is
answered here with a classifier-based separation score, the same idea
the reference's optional mixup loss uses a BERT classifier for
(hypernet_attention.py:147-191):

1. ``clf``   — train the small style classifier (classifier.py
   StyleClassifer equivalent) on ground-truth styled-fixture captions;
   report held-out accuracy (its ceiling as a style probe).
2. ``gen``   — load a trained hypernet (default: the parity-harness
   artifact), beam-decode the SAME test images under each of the three
   styles, classify every generated caption, and report the per-style
   prediction matrix + overall accuracy (chance = 1/3) and the
   cross-style divergence (fraction of image pairs whose captions
   differ between styles).
3. ``report`` — print the stored JSON.

Shares the dataset/features with benchmarks/parity_quality.py (same
2000 synthetic images over the real 35k captions + real vocab).

    python benchmarks/style_separation.py --phase clf
    python benchmarks/style_separation.py --phase gen \
        --hypernet benchmarks/_parity/trained_hypernet_jax.pkl --tag parity
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parity_quality import OUT_DIR, build_data, feature_path  # noqa: E402

STYLES = ("factual", "humour", "romantic")
CLF_PATH = os.path.join(OUT_DIR, "style_clf.pkl")


def phase_clf(args):
    """Train + evaluate the style probe on ground-truth captions."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from captionax.models.classifiers import (
        small_style_classifier_apply,
        small_style_classifier_init,
    )
    from captionax.train.state import create_train_state, make_optimizer

    vocab, data = build_data(args.images)
    train_idx, val_idx, test_idx = data.splits(seed=args.seed)
    T = 25

    def examples(indices):
        import random as _r

        rng = _r.Random(args.seed)
        ids_, labels = [], []
        for i in indices:
            for s, style in enumerate(STYLES):
                row = np.zeros((T,), np.int32)
                enc = data.caption_ids(style, i, rng=rng)[:T]
                row[: len(enc)] = enc
                ids_.append(row)
                labels.append(s)
        return np.stack(ids_), np.asarray(labels, np.int32)

    Xtr, ytr = examples(train_idx)
    Xte, yte = examples(test_idx)
    key = jax.random.PRNGKey(args.seed)
    params = small_style_classifier_init(key, len(vocab), 64, 3)
    tx = make_optimizer(1e-3)
    state = create_train_state(params, tx)

    @jax.jit
    def step(state, ids, labels):
        def loss_fn(p):
            probs = small_style_classifier_apply(p, ids)
            return -jnp.mean(
                jnp.log(probs[jnp.arange(len(labels)), labels] + 1e-9)
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads, tx), loss

    B = 256
    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    for epoch in range(args.clf_epochs):
        perm = rng.permutation(len(Xtr))
        for s in range(0, len(perm) - B, B):
            idx = perm[s : s + B]
            state, loss = step(state, Xtr[idx], ytr[idx])
        pred = np.asarray(
            small_style_classifier_apply(state.params, Xte)
        ).argmax(-1)
        acc = float((pred == yte).mean())
        print(f"clf epoch {epoch}: loss {float(loss):.4f} "
              f"held-out acc {acc:.4f} ({time.time() - t0:.0f}s)",
              flush=True)
    host = jax.tree_util.tree_map(np.asarray, state.params)
    with open(CLF_PATH, "wb") as f:
        pickle.dump(host, f)
    with open(os.path.join(OUT_DIR, "style_clf.json"), "w") as f:
        json.dump({"held_out_acc": acc, "n_test": len(yte)}, f)
    print(f"saved {CLF_PATH}; ground-truth held-out acc {acc:.4f}")


def phase_gen(args):
    """Per-style generation -> classify -> separation numbers."""
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        from captionax.core.runtime import setup_runtime

        setup_runtime()

    from captionax.decode.search import beam_search
    from captionax.models.classifiers import classifier_ids_apply_fn
    from captionax.models.hypernet import hypernet_apply

    vocab, data = build_data(args.images)
    feats = np.load(feature_path(args.images)).astype(np.float32)
    _, _, test_idx = data.splits(seed=args.seed)
    with open(args.hypernet, "rb") as f:
        params = pickle.load(f)
    # --clf-path swaps the probe (e.g. the trained BERT style3
    # classifier from benchmarks/classifier_rows.py — the probe the
    # reference's mixup loss uses, hypernet_attention.py:157-176);
    # classifier_ids_apply_fn dispatches small vs BERT off the pytree.
    with open(args.clf_path, "rb") as f:
        clf = pickle.load(f)
    clf_apply = jax.jit(classifier_ids_apply_fn(clf))

    beam_fn = jax.jit(
        lambda p, f_, th: beam_search(p, f_, k=3, max_steps=args.max_steps,
                                      gru_params=th)
    )
    T = 25
    from captionax.train.steps import resolve_style_id, style_table

    caps_by_style = {}
    for style in STYLES:
        theta = hypernet_apply(
            params["hn"],
            np.asarray(style_table(params))[
                resolve_style_id(params, vocab, style)
            ],
        )
        toks = []
        B = args.batch_size
        idx = list(test_idx)
        for s in range(0, len(idx), B):
            chunk = idx[s : s + B]
            f_ = feats[chunk]
            if len(chunk) < B:  # keep one compiled shape
                f_ = np.concatenate(
                    [f_, np.zeros((B - len(chunk),) + f_.shape[1:],
                                  f_.dtype)]
                )
            res = beam_fn(params["decoder"], f_, theta)
            toks.append(np.asarray(res.tokens)[: len(chunk)])
        caps_by_style[style] = np.concatenate(toks)
        print(f"generated {style}: {caps_by_style[style].shape}", flush=True)

    # classify generated captions (pad/crop to the probe's T)
    out = {"hypernet": args.hypernet, "images": len(test_idx),
           "probe": args.clf_path, "matrix": {}, "per_style_acc": {}}
    correct = total = 0
    for s, style in enumerate(STYLES):
        ids = np.zeros((len(test_idx), T), np.int32)
        raw = caps_by_style[style][:, 1:]  # drop the leading start token
        ids[:, : min(T, raw.shape[1])] = raw[:, :T]
        pred = np.asarray(clf_apply(clf, ids)).argmax(-1)
        row = [float((pred == k).mean()) for k in range(3)]
        out["matrix"][style] = row
        out["per_style_acc"][style] = row[s]
        correct += int((pred == s).sum())
        total += len(pred)
        print(f"{style}: classified as f/h/r = "
              f"{row[0]:.3f}/{row[1]:.3f}/{row[2]:.3f}", flush=True)
    out["overall_acc"] = correct / max(total, 1)
    out["chance"] = 1.0 / 3.0

    # divergence: same image, different styles -> different caption?
    pairs = [("factual", "humour"), ("factual", "romantic"),
             ("humour", "romantic")]
    div = {}
    for a, b in pairs:
        diff = (caps_by_style[a] != caps_by_style[b]).any(axis=1)
        div[f"{a}-vs-{b}"] = float(diff.mean())
    out["caption_divergence"] = div

    # per-style beam quality vs the styled-fixture refs (same corpus
    # CIDEr convention as CaptionTrainer.test_beam's beam_corpus_*) —
    # ties the separation cells to a did-quality-survive number
    from captionax.eval.metrics import CaptionMetrics

    import random as _r

    rng = _r.Random(args.seed)
    out["beam_quality"] = {}
    for style in STYLES:
        q = CaptionMetrics(vocab)
        refs = np.zeros((len(test_idx), T), np.int32)
        for j, i in enumerate(test_idx):
            enc = data.caption_ids(style, i, rng=rng)[:T]
            refs[j, : len(enc)] = enc
        q.add_batch_ids(refs, caps_by_style[style])
        scores = q.compute()
        out["beam_quality"][style] = {
            k: round(float(v), 4) for k, v in scores.items()
            if k in ("bleu1", "cider")
        }
        print(f"{style}: beam corpus BLEU-1 {scores['bleu1']:.4f} "
              f"CIDEr {scores['cider']:.4f}", flush=True)
    tag = args.tag or "run"
    path = os.path.join(OUT_DIR, f"style_separation_{tag}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("overall_acc", "per_style_acc",
                       "caption_divergence")}))
    print(f"wrote {path}")


def phase_mixup_train(args):
    """Train the hypernet WITH the mixup style loss (alpha=0.3, the
    reference's optional path, hypernet_attention.py:147-191) on the
    identical data/seed as the parity run, so ``gen --tag mixup`` can
    measure what the auxiliary loss buys in separation."""
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        from captionax.core.runtime import setup_runtime

        setup_runtime()

    from captionax.cli.common import build_hypernet_model
    from captionax.core.config import ModelConfig, TrainConfig
    from captionax.train.harness import CaptionTrainer
    from parity_quality import eval_batches, inject

    vocab, data = build_data(args.images)
    feats = np.load(feature_path(args.images)).astype(np.float32)
    model_cfg = ModelConfig(vocab_size=len(vocab))
    cfg = TrainConfig(
        lr=args.lr, batch_size=args.batch_size, max_epochs=args.epochs,
        seed=args.seed, mixup=True, mixup_alpha=args.alpha,
        checkpoint_dir=os.path.join(OUT_DIR, "ckpt_mixup"),
    )
    with open(CLF_PATH, "rb") as f:
        clf = pickle.load(f)
    params = build_hypernet_model(model_cfg, vocab, jax.random.PRNGKey(args.seed),
                                  hyper_emb=model_cfg.embed_size)
    trainer = CaptionTrainer(params, "hypernet", cfg, vocab,
                             run_name="mixup", style_classifier_params=clf)
    train_idx, val_idx, _ = data.splits(seed=args.seed)
    t0 = time.time()
    trainer.fit(
        lambda epoch: inject(
            data.batches(train_idx, args.batch_size, style="random",
                         seed=args.seed + epoch, with_images=False),
            feats,
        ),
        lambda: eval_batches(data, val_idx, args.batch_size, "random",
                             feats),
    )
    host = jax.tree_util.tree_map(np.asarray, trainer.params)
    with open(os.path.join(OUT_DIR, "trained_hypernet_mixup.pkl"), "wb") as f:
        pickle.dump(host, f)
    print(f"mixup-trained hypernet saved ({time.time() - t0:.0f}s)")


def phase_dedicated_train(args):
    """Train the hypernet with the dedicated 3-row style table
    (ModelConfig.dedicated_style_tokens — the opt-in fix for the
    reference's 'humour'-><unk> conditioning) on the identical
    data/seed as the parity run; ``gen --tag dedicated`` then measures
    what decoupling humour's embedding from the OOV row buys."""
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        from captionax.core.runtime import setup_runtime

        setup_runtime()

    from captionax.cli.common import build_hypernet_model
    from captionax.core.config import ModelConfig, TrainConfig
    from captionax.train.harness import CaptionTrainer
    from captionax.train.steps import dedicated_style_embed
    from parity_quality import eval_batches, inject

    vocab, data = build_data(args.images)
    data.dedicated_style_tokens = True
    feats = np.load(feature_path(args.images)).astype(np.float32)
    model_cfg = ModelConfig(vocab_size=len(vocab),
                            dedicated_style_tokens=True)
    suffix = f"_{args.tag}" if args.tag else ""
    cfg = TrainConfig(
        lr=args.lr, batch_size=args.batch_size, max_epochs=args.epochs,
        seed=args.seed,
        checkpoint_dir=os.path.join(OUT_DIR, f"ckpt_dedicated{suffix}"),
    )
    params = build_hypernet_model(model_cfg, vocab,
                                  jax.random.PRNGKey(args.seed),
                                  hyper_emb=model_cfg.embed_size)
    trainer = CaptionTrainer(params, "hypernet", cfg, vocab,
                             run_name="dedicated",
                             embed_fn=dedicated_style_embed)
    train_idx, val_idx, _ = data.splits(seed=args.seed)
    t0 = time.time()
    trainer.fit(
        lambda epoch: inject(
            data.batches(train_idx, args.batch_size, style="random",
                         seed=args.seed + epoch, with_images=False),
            feats,
        ),
        lambda: eval_batches(data, val_idx, args.batch_size, "random",
                             feats),
    )
    host = jax.tree_util.tree_map(np.asarray, trainer.params)
    with open(os.path.join(OUT_DIR,
                           f"trained_hypernet_dedicated{suffix}.pkl"),
              "wb") as f:
        pickle.dump(host, f)
    print(f"dedicated-token hypernet saved ({time.time() - t0:.0f}s)")


def phase_dedicated_mixup_train(args):
    """The remaining A/B cell: dedicated 3-row style table AND the
    mixup loss together, on the identical data/seed.  Asks whether
    mixup's separation collapse (BASELINE.md style-separation table) was
    an artifact of the reference's 'humour'-><unk> conditioning or is
    intrinsic to the objective.  Trains with the split-dispatch gradient
    (TrainConfig.mixup_split) — the fused mixup grad graph wedges the
    relay compiler, the split is exact by linearity (steps.py)."""
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        from captionax.core.runtime import setup_runtime

        setup_runtime()

    from captionax.cli.common import build_hypernet_model
    from captionax.core.config import ModelConfig, TrainConfig
    from captionax.train.harness import CaptionTrainer
    from captionax.train.steps import dedicated_style_embed
    from parity_quality import eval_batches, inject

    vocab, data = build_data(args.images)
    data.dedicated_style_tokens = True
    feats = np.load(feature_path(args.images)).astype(np.float32)
    model_cfg = ModelConfig(vocab_size=len(vocab),
                            dedicated_style_tokens=True)
    cfg = TrainConfig(
        lr=args.lr, batch_size=args.batch_size, max_epochs=args.epochs,
        seed=args.seed, mixup=True, mixup_alpha=args.alpha,
        mixup_split=not args.cpu,
        checkpoint_dir=os.path.join(OUT_DIR, "ckpt_dedicated_mixup"),
    )
    with open(CLF_PATH, "rb") as f:
        clf = pickle.load(f)
    params = build_hypernet_model(model_cfg, vocab,
                                  jax.random.PRNGKey(args.seed),
                                  hyper_emb=model_cfg.embed_size)
    trainer = CaptionTrainer(params, "hypernet", cfg, vocab,
                             run_name="dedicated_mixup",
                             embed_fn=dedicated_style_embed,
                             style_classifier_params=clf)
    train_idx, val_idx, _ = data.splits(seed=args.seed)
    t0 = time.time()
    trainer.fit(
        lambda epoch: inject(
            data.batches(train_idx, args.batch_size, style="random",
                         seed=args.seed + epoch, with_images=False),
            feats,
        ),
        lambda: eval_batches(data, val_idx, args.batch_size, "random",
                             feats),
    )
    host = jax.tree_util.tree_map(np.asarray, trainer.params)
    with open(os.path.join(OUT_DIR, "trained_hypernet_dedicated_mixup.pkl"),
              "wb") as f:
        pickle.dump(host, f)
    print(f"dedicated+mixup hypernet saved ({time.time() - t0:.0f}s)")


def _phase_aux_train(args, dedicated: bool):
    """Train the hypernet with the style-identification auxiliary loss
    (steps.make_hypernet_styleaux_steps — a captionax extension with no
    reference equivalent): free-run under the batch's own theta, the
    frozen style probe must recognize the style.  Same data/seed as the
    parity run; ``gen --tag aux`` / ``--tag dedicated_aux`` then measure
    what it buys in separation vs the mixup A/B cells.  Trains with the
    split-dispatch gradient off-CPU (the fused two-scan grad graph
    wedges the relay compiler, CLAUDE.md)."""
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        from captionax.core.runtime import setup_runtime

        setup_runtime()

    from captionax.cli.common import build_hypernet_model
    from captionax.core.config import ModelConfig, TrainConfig
    from captionax.train.harness import CaptionTrainer
    from captionax.train.steps import (
        dedicated_style_embed,
        resolve_style_id,
        style_table,
        style_token_embed,
    )
    from parity_quality import eval_batches, inject

    vocab, data = build_data(args.images)
    data.dedicated_style_tokens = dedicated
    feats = np.load(feature_path(args.images)).astype(np.float32)
    model_cfg = ModelConfig(vocab_size=len(vocab),
                            dedicated_style_tokens=dedicated)
    tag = "dedicated_aux" if dedicated else "aux"
    select = args.select_sep or args.select_sep_margin
    if args.select_sep_margin:
        tag += "_selm"
    elif args.select_sep:
        tag += "_sel"
    if args.init_distilled:
        tag += "_dinit"
    if args.seed:
        tag += f"_s{args.seed}"
    sel_metric = ("val_sep_margin" if args.select_sep_margin
                  else "val_sep_acc")
    cfg = TrainConfig(
        lr=args.lr, batch_size=args.batch_size, max_epochs=args.epochs,
        seed=args.seed, style_aux=True, style_aux_alpha=args.aux_alpha,
        style_aux_split=not args.cpu,
        checkpoint_dir=os.path.join(OUT_DIR, f"ckpt_{tag}"),
        select_metric=sel_metric if select else "val_loss_tf",
        select_mode="max" if select else "min",
    )
    with open(CLF_PATH, "rb") as f:
        clf = pickle.load(f)
    params = build_hypernet_model(model_cfg, vocab,
                                  jax.random.PRNGKey(args.seed),
                                  hyper_emb=model_cfg.embed_size)
    if args.init_distilled:
        # warm-start the hypernet from the train_init distillation
        # (benchmarks/init_distill.py --phase targets,distill — the
        # reference's pretrain-then-finetune design, train_init.py:70-123).
        # The pkl holds the full model pytree; only the hn is distilled —
        # the decoder keeps this run's seed-dependent init.
        with open(os.path.join(OUT_DIR, "distilled_hn.pkl"), "rb") as f:
            params["hn"] = pickle.load(f)["hn"]
    trainer = CaptionTrainer(
        params, "hypernet", cfg, vocab, run_name=tag,
        style_classifier_params=clf,
        embed_fn=dedicated_style_embed if dedicated else style_token_embed,
    )
    train_idx, val_idx, _ = data.splits(seed=args.seed)

    sep_hook = None
    if select:
        # per-epoch VALIDATION-split separation probe (test split stays
        # unseen — ``gen`` reports on it): free-run a fixed val subset
        # under each style, frozen-probe classify, monitor a separation
        # metric.  This is the Lightning ModelCheckpoint(monitor=...)
        # pattern the reference uses for val loss, pointed at the metric
        # the aux objective exists to improve — selection, not training
        # signal.  Two monitor variants, both measured (BASELINE.md):
        # --select-sep: GREEDY decode + accuracy.  Measured caveats: the
        #   accuracy saturates at 1.0 (selection then freezes on the
        #   first saturated epoch) and greedy output is more
        #   style-marked than the beam output ``gen`` reports on.
        # --select-sep-margin: k=3 BEAM decode (matched to ``gen``) +
        #   mean probe probability of the true style — continuous, so
        #   later genuinely-better epochs keep winning.
        import jax.numpy as jnp

        from captionax.decode.search import beam_search
        from captionax.decode.search import greedy as greedy_decode
        from captionax.models.classifiers import (
            small_style_classifier_apply,
        )
        from captionax.models.hypernet import hypernet_apply

        probe_feats = feats[np.asarray(val_idx[:192])]
        sids = [resolve_style_id(params, vocab, s) for s in STYLES]
        probe_T = 25  # the probe's trained caption length

        @jax.jit
        def _probe_one(p, f_, sid):
            theta = hypernet_apply(p["hn"], style_table(p)[sid])
            if args.select_sep_margin:
                ids = beam_search(p["decoder"], f_, k=3, max_steps=20,
                                  gru_params=theta).tokens
            else:
                ids = greedy_decode(p["decoder"], f_, max_len=20,
                                    gru_params=theta)
            padded = jnp.zeros((ids.shape[0], probe_T), jnp.int32)
            padded = padded.at[:, : ids.shape[1]].set(ids)
            return jax.nn.softmax(
                small_style_classifier_apply(clf, padded), axis=-1
            )

        def sep_hook(p):
            true_prob, correct, total = 0.0, 0, 0
            for k, sid in enumerate(sids):
                probs = np.asarray(
                    _probe_one(p, probe_feats, jnp.int32(sid))
                )
                true_prob += float(probs[:, k].sum())
                correct += int((probs.argmax(-1) == k).sum())
                total += len(probs)
            return {"val_sep_acc": correct / max(total, 1),
                    "val_sep_margin": true_prob / max(total, 1)}

    t0 = time.time()
    trainer.fit(
        lambda epoch: inject(
            data.batches(train_idx, args.batch_size, style="random",
                         seed=args.seed + epoch, with_images=False),
            feats,
        ),
        lambda: eval_batches(data, val_idx, args.batch_size, "random",
                             feats),
        epoch_end_metrics=sep_hook,
    )
    host = jax.tree_util.tree_map(np.asarray, trainer.params)
    if select:
        # ship the SELECTED epoch, not the last one
        from captionax.train.checkpoint import restore_checkpoint

        host = restore_checkpoint(cfg.checkpoint_dir, like=host)
        host = jax.tree_util.tree_map(np.asarray, host)
        print(f"selected checkpoint {sel_metric}="
              f"{-trainer.checkpointer.best:.4f}")
    with open(os.path.join(OUT_DIR, f"trained_hypernet_{tag}.pkl"),
              "wb") as f:
        pickle.dump(host, f)
    print(f"{tag}-trained hypernet saved ({time.time() - t0:.0f}s)")


def phase_aux_train(args):
    _phase_aux_train(args, dedicated=False)


def phase_dedicated_aux_train(args):
    _phase_aux_train(args, dedicated=True)


def phase_report(args):
    for name in sorted(os.listdir(OUT_DIR)):
        if name.startswith("style_separation") or name == "style_clf.json":
            with open(os.path.join(OUT_DIR, name)) as f:
                print(name, "=>", f.read().strip())


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--phase",
                   choices=["clf", "gen", "mixup-train", "dedicated-train",
                            "dedicated-mixup-train", "aux-train",
                            "dedicated-aux-train", "report"],
                   default="report")
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (relay fallback)")
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument("--alpha", type=float, default=0.3)
    p.add_argument("--aux-alpha", type=float, default=0.7,
                   help="style-aux phases: loss = alpha*CE + (1-alpha)*aux")
    p.add_argument("--select-sep", action="store_true",
                   help="aux phases: checkpoint-select on per-epoch "
                        "VALIDATION style separation (tag gains _sel)")
    p.add_argument("--init-distilled", action="store_true",
                   help="aux phases: warm-start the hypernet from "
                        "benchmarks/_parity/distilled_hn.pkl "
                        "(init_distill.py) — tag gains _dinit")
    p.add_argument("--select-sep-margin", action="store_true",
                   help="like --select-sep but the monitor is the mean "
                        "frozen-probe probability of the true style over "
                        "BEAM-decoded val captions (continuous, matched to "
                        "the gen phase's decode; tag gains _selm)")
    p.add_argument("--images", type=int, default=2000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--clf-epochs", type=int, default=5)
    p.add_argument("--clf-path", type=str, default=CLF_PATH,
                   help="probe params pickle for the gen phase (small "
                        "or BERT — auto-dispatched off the pytree)")
    p.add_argument("--hypernet", type=str,
                   default=os.path.join(OUT_DIR, "trained_hypernet_jax.pkl"))
    p.add_argument("--tag", type=str, default="")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--max-steps", type=int, default=20)
    args = p.parse_args(argv)
    {"clf": phase_clf, "gen": phase_gen, "mixup-train": phase_mixup_train,
     "dedicated-train": phase_dedicated_train,
     "dedicated-mixup-train": phase_dedicated_mixup_train,
     "aux-train": phase_aux_train,
     "dedicated-aux-train": phase_dedicated_aux_train,
     "report": phase_report}[args.phase](args)


if __name__ == "__main__":
    main()

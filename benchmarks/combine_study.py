"""Measured evidence for the combined Flickr+CC hypernet
(/root/reference/train_hyper_combine.py:42-338, test_all.py:40-100):
loss trajectory, the 5-loader test_all report, and a 4-way
style/domain separation study (factual / humour / romantic / CC).

Phases (all user-surface: the CLIs do the training/eval):
- train   — cli.train_hyper_combine on styled-fixture Flickr (real
            captions, synthetic images) + the real 200_conceptual
            corpus with windows/9gag/twincities held out (the same
            seen/zero-shot split as cc_gru_vs_hypernet.py);
- testall — cli.test_all over the 5 loaders (3 Flickr styles, CC test
            split, CC zero-shot domains) from the trained checkpoint;
- probe   — small 4-class caption classifier on ground-truth text
            (f/h/r/CC — the style_classifier_all.py label set) with
            held-out accuracy;
- sep     — decode the Flickr test images under each of the 4
            conditionings (pseudo-domains 'f'/'h'/'r' + seen CC
            domains) and classify -> 4-way separation matrix,
            divergence, per-conditioning beam quality;
- report.

Usage:
    python benchmarks/combine_study.py --phase all [--epochs 10]
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

from cc_gru_vs_hypernet import ZS_DOMAINS, split_files  # noqa: E402

OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_parity")
CKPT = os.path.join(OUT_DIR, "ckpt_combine")


def _ckpt(args):
    return CKPT + getattr(args, "tag", "")


def _art(args, name):
    """Tagged artifact path (e.g. --tag _s1 for seed replications)."""
    return os.path.join(OUT_DIR, f"{name}{getattr(args, 'tag', '')}.json")
PROBE_PATH = os.path.join(OUT_DIR, "combine_probe.pkl")
LABELS4 = ("factual", "humour", "romantic", "CC")


def common_flags(args, seen_p, zs_p):
    return [
        "--synthetic", "--styled-fixture",
        "--synthetic-images", str(args.images),
        "--vocab-path", "/root/reference/data/vocab.pkl",
        "--factual-captions", "/root/reference/data/factual_train.txt",
        "--cc-captions", seen_p,
        "--cc-oneshot-captions", zs_p,
        "--domain-scheme", args.scheme,
        "--batch-size", str(args.batch_size),
        "--max-epochs", str(args.epochs),
        "--seed", str(args.seed),
        "--lr", str(args.lr),
        "--checkpoint-dir", _ckpt(args),
        "--encoder-depth", str(args.encoder_depth),
        # HBM-resident feature table: zero per-step host->device feature
        # traffic, which also sidesteps the relay's RSS-leak-per-transfer
        # (the r03 run of this study grew to 41 GB RSS on the host path)
        "--cache-features-device",
    ]


DISTILL_PATH = os.path.join(OUT_DIR, "combine_distilled_hn.pkl")


def _distill_path(args):
    return DISTILL_PATH.replace(".pkl", f"{getattr(args, 'tag', '')}.pkl")


def phase_train(args):
    from captionax.cli.train_hyper_combine import main as train_main

    seen_p, zs_p = split_files(OUT_DIR)
    flags = common_flags(args, seen_p, zs_p)
    # the captionax separation recipe (BASELINE.md: 0.99+ separation at
    # every seed on pure FlickrStyle): style-identification aux loss +
    # beam-matched margin checkpoint selection + distilled hn init
    if args.style_aux:
        flags += ["--style-aux"]
        if args.platform != "cpu":
            # fused two-scan grad graphs wedge the relay AOT helper
            flags += ["--style-aux-split"]
    if args.select_sep_margin:
        flags += ["--select-sep-margin"]
    if args.style_aux or args.select_sep_margin:
        flags += ["--style-classifier", PROBE_PATH]
    if args.init_distilled:
        flags += ["--init-hn", _distill_path(args)]
    if args.skip_val_quality:
        flags += ["--skip-val-quality"]
    t0 = time.time()
    history = train_main(flags)
    out = {"history": {k: {m: float(v) for m, v in h.items()}
                       for k, h in history.items()},
           "train_seconds": time.time() - t0,
           "recipe": {"style_aux": args.style_aux,
                      "select_sep_margin": args.select_sep_margin,
                      "init_distilled": args.init_distilled,
                      "batch_size": args.batch_size,
                      "epochs": args.epochs}}
    with open(_art(args, "combine_train"), "w") as f:
        json.dump(out, f, indent=1)
    print("train done", out["train_seconds"], "s")


def phase_distill(args):
    """Distill the COMBINED model's hypernet: map the f/h/r conditioning
    embeddings (the model's own domain_emb rows at their run-seed init)
    to the three per-style trained GRU weight vectors from
    benchmarks/init_distill.py --phase targets (the reference's
    pretrain-then-finetune design, train_init.py:70-123, applied to the
    combined conditioning space)."""
    import jax
    import jax.numpy as jnp
    import optax

    from captionax.models.hypernet import hypernet_apply_flat

    targets_path = os.path.join(OUT_DIR, "distill_targets.pkl")
    if not os.path.exists(targets_path):
        raise SystemExit(
            f"{targets_path} missing — run `python benchmarks/"
            "init_distill.py --phase targets` first")
    with open(targets_path, "rb") as f:
        targets = pickle.load(f)
    styles = ("factual", "humour", "romantic")
    tvec = jnp.stack([jnp.asarray(targets[s]) for s in styles])

    # params exactly as the training CLI builds them (same seed path)
    _, _, _, _, embedder, params, _ = _load_sep_model_init(args)
    embs = jnp.stack([
        jnp.asarray(embedder.embed(
            params["domain_emb"], np.asarray(embedder.host_vector(d))))
        for d in ("f", "h", "r")])

    tx = optax.adam(args.distill_lr)
    hn = params["hn"]
    opt_state = tx.init(hn)

    @jax.jit
    def step(hn, opt_state, idx):
        def loss_fn(hn):
            theta = hypernet_apply_flat(hn, embs[idx])
            return jnp.mean((theta - tvec[idx]) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(hn)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(hn, updates), opt_state, loss

    t0 = time.time()
    traj = {}
    for i in range(args.distill_steps):
        hn, opt_state, loss = step(hn, opt_state, i % 3)
        lv = float(loss)
        if i % 200 == 0:
            traj[i] = lv
            print(f"distill step {i} mse {lv:.3e} "
                  f"({time.time() - t0:.0f}s)", flush=True)
        if lv < 1e-9:  # reference threshold, train_init.py:111
            break
    traj[i] = lv
    import jax as _jax

    host = _jax.tree_util.tree_map(np.asarray, {"hn": hn})
    with open(_distill_path(args), "wb") as f:
        pickle.dump(host, f)
    with open(_art(args, "combine_distill"), "w") as f:
        json.dump({"final_mse": lv, "steps": i + 1,
                   "seconds": time.time() - t0, "trajectory": traj}, f,
                  indent=1)
    print(f"saved {_distill_path(args)} (mse {lv:.3e}, {i + 1} steps)")


def _load_sep_model_init(args):
    """Like _load_sep_model but WITHOUT restoring a checkpoint: the
    model exactly at its run-seed init (what training starts from)."""
    import jax

    from captionax.cli.common import build_hypernet_model
    from captionax.core.config import ModelConfig
    from captionax.data.cc import domain_list
    from captionax.data.combine import style_histograms
    from captionax.data.domains import DomainEmbedder

    seen_p, _ = split_files(OUT_DIR)
    vocab, data = _build_data(args)
    cc_domains = domain_list(seen_p)
    model_cfg = ModelConfig(vocab_size=len(vocab),
                            encoder_depth=args.encoder_depth)
    embedder = DomainEmbedder(
        args.scheme, vocab, cc_domains, hyper_emb=model_cfg.hyper_emb,
        cap_path=seen_p, zero_shot_domains=list("fhr"))
    if args.scheme.startswith("histograme"):
        embedder.table.update(
            {k: np.asarray(v, np.float32)
             for k, v in style_histograms(data, vocab).items()})
    key = jax.random.PRNGKey(args.seed)
    k1, k2, k3 = jax.random.split(key, 3)
    params = build_hypernet_model(model_cfg, vocab, k1,
                                  hyper_emb=embedder.hyper_emb)
    params["domain_emb"] = embedder.init_params(k3)
    return vocab, data, cc_domains, model_cfg, embedder, params, k2


def phase_testall(args):
    from captionax.cli.test_all import main as testall_main

    seen_p, zs_p = split_files(OUT_DIR)
    res = testall_main(common_flags(args, seen_p, zs_p))
    res = {split: {k: float(v) for k, v in r.items()}
           for split, r in res.items()}
    with open(_art(args, "combine_testall"), "w") as f:
        json.dump(res, f, indent=1)
    for split, r in res.items():
        print(split, {k: round(v, 4) for k, v in r.items()
                      if "cider" in k or "bleu1" in k or "completed" in k},
              flush=True)


def _build_data(args):
    from captionax.core.vocab import load_vocab_pickle
    from captionax.data.flickr import load_factual_captions
    from captionax.data.synthetic import synthetic_flickr_style

    vocab = load_vocab_pickle("/root/reference/data/vocab.pkl")
    factual = load_factual_captions("/root/reference/data/factual_train.txt")
    data = synthetic_flickr_style(
        num_images=args.images, vocab=vocab, max_len=25,
        factual_lines=[c for _, c in factual], styled_fixture=True)
    return vocab, data


def phase_probe(args):
    """Small 4-class probe on ground-truth captions, held-out acc."""
    import jax

    from captionax.data.cc import load_cc_captions
    from captionax.models.classifiers import (
        small_style_classifier_apply,
        small_style_classifier_init,
    )
    from captionax.train.state import create_train_state, make_optimizer
    import jax.numpy as jnp
    import random as _r

    vocab, data = _build_data(args)
    seen_p, _ = split_files(OUT_DIR)
    T = 25
    rng = _r.Random(args.seed)
    X, y = [], []
    for i in range(len(data)):
        for s, style in enumerate(("factual", "humour", "romantic")):
            enc = data.caption_ids(style, i, rng=rng)[:T]
            row = np.zeros((T,), np.int32)
            row[: len(enc)] = enc
            X.append(row)
            y.append(s)
    cc_rows = load_cc_captions(seen_p)
    rng.shuffle(cc_rows)
    for _, cap, _ in cc_rows[: len(data)]:
        enc = np.asarray(vocab.encode(cap)[:T], np.int32)
        row = np.zeros((T,), np.int32)
        row[: len(enc)] = enc
        X.append(row)
        y.append(3)
    X = np.stack(X)
    y = np.asarray(y, np.int32)
    rs = np.random.RandomState(args.seed)
    perm = rs.permutation(len(X))
    cut = len(X) // 10
    Xtr, ytr = X[perm[cut:]], y[perm[cut:]]
    Xte, yte = X[perm[:cut]], y[perm[:cut]]

    params = small_style_classifier_init(jax.random.PRNGKey(args.seed),
                                         len(vocab), 64, 4)
    tx = make_optimizer(2e-3, 5.0)
    state = create_train_state(params, tx)

    @jax.jit
    def step(state, ids, labels):
        def loss_fn(p):
            probs = small_style_classifier_apply(p, ids)
            return -jnp.mean(
                jnp.log(probs[jnp.arange(len(labels)), labels] + 1e-9))

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads, tx), loss

    B = 256
    acc = 0.0
    for epoch in range(args.probe_epochs):
        p2 = rs.permutation(len(Xtr))
        for s in range(0, len(p2) - B, B):
            state, loss = step(state, Xtr[p2[s:s + B]], ytr[p2[s:s + B]])
        pred = np.asarray(
            small_style_classifier_apply(state.params, Xte)).argmax(-1)
        acc = float((pred == yte).mean())
        print(f"probe epoch {epoch}: held-out acc {acc:.4f}", flush=True)
    host = jax.tree_util.tree_map(np.asarray, state.params)
    with open(PROBE_PATH, "wb") as f:
        pickle.dump(host, f)
    with open(os.path.join(OUT_DIR, "combine_probe.json"), "w") as f:
        json.dump({"held_out_acc": acc, "n_test": int(len(yte)),
                   "chance": 0.25}, f)
    print(f"saved {PROBE_PATH} (held-out acc {acc:.4f})")


def _load_sep_model(args):
    """Shared by phase_sep / phase_thetadist: rebuild the embedder +
    model exactly as the training CLI does and restore the trained
    checkpoint."""
    from captionax.train.checkpoint import restore_checkpoint

    (vocab, data, cc_domains, model_cfg, embedder, params,
     k2) = _load_sep_model_init(args)
    params = restore_checkpoint(_ckpt(args), like=params)
    return vocab, data, cc_domains, model_cfg, embedder, params, k2


def _sep_conditionings(args, cc_domains):
    conds = [("factual", "f", 0), ("humour", "h", 1), ("romantic", "r", 2)]
    cc_pick = cc_domains[:: max(1, len(cc_domains) // args.cc_conds)][
        : args.cc_conds]
    conds += [(f"cc:{d}", d, 3) for d in cc_pick]
    return conds, cc_pick


def _theta_distances(embedder, params, conds):
    """Pairwise L2 between the conditionings' synthesized thetas — the
    wiring sanity check behind a divergence-0 separation result: 9
    different conditionings producing bit-identical beams for every
    image is only a model property if their thetas genuinely differ
    (VERDICT r4 weak #1a)."""
    from captionax.models.hypernet import hypernet_apply

    thetas, embs = {}, {}
    for name, dom, _cls in conds:
        emb = embedder.embed(params["domain_emb"],
                             np.asarray(embedder.host_vector(dom)))
        theta = hypernet_apply(params["hn"], emb)
        embs[name] = np.asarray(emb, np.float32)
        flat = np.concatenate(
            [np.asarray(v, np.float32).ravel()
             for v in jax_leaves_sorted(theta)])
        thetas[name] = flat
    names = [c[0] for c in conds]
    out = {"emb_l2": {}, "theta_l2": {}, "theta_norms": {
        n: float(np.linalg.norm(v)) for n, v in thetas.items()}}
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            a, b = names[i], names[j]
            out["emb_l2"][f"{a}-vs-{b}"] = float(
                np.linalg.norm(embs[a] - embs[b]))
            out["theta_l2"][f"{a}-vs-{b}"] = float(
                np.linalg.norm(thetas[a] - thetas[b]))
    return out


def jax_leaves_sorted(tree):
    import jax

    leaves, _ = jax.tree_util.tree_flatten(tree)
    return leaves


def phase_thetadist(args):
    """Standalone (CPU-runnable) theta-distance check on the trained
    combined checkpoint."""
    _, _, cc_domains, _, embedder, params, _ = _load_sep_model(args)
    conds, _ = _sep_conditionings(args, cc_domains)
    dist = _theta_distances(embedder, params, conds)
    path = _art(args, "combine_thetadist")
    with open(path, "w") as f:
        json.dump(dist, f, indent=1)
    tl2 = dist["theta_l2"]
    print(f"theta norms: { {k: round(v, 3) for k, v in dist['theta_norms'].items()} }")
    print(f"theta pairwise L2 min={min(tl2.values()):.5f} "
          f"max={max(tl2.values()):.5f}")
    for k, v in sorted(tl2.items(), key=lambda kv: kv[1])[:6]:
        print(f"  {k}: {v:.5f}  (emb L2 {dist['emb_l2'][k]:.5f})")
    print(f"wrote {path}")


def phase_sep(args):
    """4-way separation: decode Flickr test images under each
    conditioning, classify with the 4-class probe."""
    import jax

    from captionax.cli.common import build_encoder
    from captionax.data.transforms import preprocess_images
    from captionax.decode.search import beam_search
    from captionax.models.classifiers import small_style_classifier_apply
    from captionax.models.encoder import encoder_cnn
    from captionax.models.hypernet import hypernet_apply
    from captionax.eval.metrics import CaptionMetrics

    (vocab, data, cc_domains, model_cfg, embedder, params,
     k2) = _load_sep_model(args)
    encoder_params = build_encoder(model_cfg, k2)
    with open(PROBE_PATH, "rb") as f:
        probe = pickle.load(f)

    encode = jax.jit(lambda im: encoder_cnn(encoder_params,
                                            preprocess_images(im)))
    beam_fn = jax.jit(lambda p, f_, th: beam_search(
        p, f_, k=3, max_steps=args.max_steps, gru_params=th))

    _, _, test_idx = data.splits(seed=args.seed)
    test_idx = list(test_idx)[: args.sep_images]
    B = args.batch_size
    feats = []
    for s in range(0, len(test_idx), B):
        chunk = test_idx[s:s + B]
        imgs = np.stack([data.image(i) for i in chunk])
        if len(chunk) < B:
            imgs = np.concatenate(
                [imgs, np.zeros((B - len(chunk),) + imgs.shape[1:],
                                imgs.dtype)])
        feats.append(np.asarray(encode(imgs))[: len(chunk)])
    feats = np.concatenate(feats)

    # conditionings: 3 Flickr pseudo-domains + N seen CC domains
    conds, cc_pick = _sep_conditionings(args, cc_domains)
    # wiring sanity check FIRST: pairwise theta distances (a
    # divergence-0 result below is only meaningful if these are > 0)
    theta_dist = _theta_distances(embedder, params, conds)
    print(f"theta pairwise L2 min={min(theta_dist['theta_l2'].values()):.5f} "
          f"max={max(theta_dist['theta_l2'].values()):.5f}", flush=True)

    T = 25
    caps_by = {}
    for name, dom, _cls in conds:
        emb = embedder.embed(params["domain_emb"],
                             np.asarray(embedder.host_vector(dom)))
        theta = hypernet_apply(params["hn"], emb)
        toks = []
        for s in range(0, len(test_idx), B):
            f_ = feats[s:s + B]
            if len(f_) < B:
                f_ = np.concatenate(
                    [f_, np.zeros((B - len(f_),) + f_.shape[1:], f_.dtype)])
            res = beam_fn(params["decoder"], f_, theta)
            toks.append(np.asarray(res.tokens)[: len(feats[s:s + B])])
        caps_by[name] = np.concatenate(toks)[: len(test_idx)]
        print(f"decoded {name}", flush=True)

    out = {"matrix": {}, "per_cond_acc": {}, "images": len(test_idx),
           "cc_conditionings": cc_pick, "theta_dist": theta_dist}
    correct = total = 0
    for name, dom, cls in conds:
        ids = np.zeros((len(test_idx), T), np.int32)
        raw = caps_by[name][:, 1:]
        ids[:, : min(T, raw.shape[1])] = raw[:, :T]
        pred = np.asarray(small_style_classifier_apply(probe, ids)).argmax(-1)
        row = [float((pred == k).mean()) for k in range(4)]
        out["matrix"][name] = row
        out["per_cond_acc"][name] = row[cls]
        correct += int((pred == cls).sum())
        total += len(pred)
        print(f"{name}: classified f/h/r/CC = "
              + "/".join(f"{v:.3f}" for v in row), flush=True)
    out["overall_acc"] = correct / max(total, 1)
    out["chance"] = 0.25

    names = [c[0] for c in conds[:3]] + [conds[3][0]]
    div = {}
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            diff = (caps_by[names[i]] != caps_by[names[j]]).any(axis=1)
            div[f"{names[i]}-vs-{names[j]}"] = float(diff.mean())
    out["caption_divergence"] = div

    import random as _r

    rng = _r.Random(args.seed)
    out["beam_quality"] = {}
    for s, style in enumerate(("factual", "humour", "romantic")):
        q = CaptionMetrics(vocab)
        refs = np.zeros((len(test_idx), T), np.int32)
        for j, i in enumerate(test_idx):
            enc = data.caption_ids(style, i, rng=rng)[:T]
            refs[j, : len(enc)] = enc
        q.add_batch_ids(refs, caps_by[style])
        sc = q.compute()
        out["beam_quality"][style] = {k: round(float(v), 4)
                                      for k, v in sc.items()
                                      if k in ("bleu1", "cider")}
    with open(_art(args, "combine_sep"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in ("overall_acc", "per_cond_acc")}))


def phase_report(args):
    for name in ("combine_train", "combine_testall", "combine_probe",
                 "combine_sep"):
        p = os.path.join(OUT_DIR, f"{name}.json")
        if os.path.exists(p):
            d = json.load(open(p))
            if name == "combine_train":
                hist = d["history"]
                last = hist[max(hist, key=int)]
                print(f"train: {len(hist)} epochs, last "
                      f"{ {k: round(v, 4) for k, v in last.items()} }, "
                      f"{d['train_seconds']:.0f}s")
            elif name == "combine_sep":
                print("4-way separation:", round(d["overall_acc"], 4),
                      {k: round(v, 3) for k, v in d["per_cond_acc"].items()})
            elif name == "combine_probe":
                print("probe held-out acc:", d["held_out_acc"])
            else:
                for split, r in d.items():
                    print(split, {k: round(v, 4) for k, v in r.items()
                                  if "cider" in k or "completed" in k})


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--images", type=int, default=2000)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--lr", type=float, default=5e-3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--scheme", default="embedding")
    p.add_argument("--max-steps", type=int, default=20)
    p.add_argument("--sep-images", type=int, default=192)
    p.add_argument("--cc-conds", type=int, default=6)
    p.add_argument("--probe-epochs", type=int, default=10)
    p.add_argument("--encoder-depth", type=int, default=152)
    p.add_argument("--style-aux", action="store_true",
                   help="train with the 4-class style/domain aux loss "
                        "(probe from --phase probe)")
    p.add_argument("--select-sep-margin", action="store_true",
                   help="checkpoint-select on validation separation "
                        "margin (beam-matched, continuous)")
    p.add_argument("--init-distilled", action="store_true",
                   help="warm-start the hypernet from --phase distill")
    p.add_argument("--skip-val-quality", action="store_true",
                   help="skip per-epoch val BLEU/METEOR/ROUGE/CIDEr "
                        "(single-core Python, ~minutes/epoch at this "
                        "val size)")
    p.add_argument("--tag", default="",
                   help="artifact/checkpoint suffix (e.g. _s1 for seed "
                        "replications)")
    p.add_argument("--distill-lr", type=float, default=1e-3)
    p.add_argument("--distill-steps", type=int, default=6000)
    p.add_argument("--phase", default="all",
                   choices=["all", "train", "testall", "probe", "sep",
                            "thetadist", "distill", "report"])
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
    # probe first: the aux-recipe train phase consumes it
    phases = (["probe", "train", "testall", "sep", "report"]
              if args.phase == "all" else [args.phase])
    for ph in phases:
        globals()[f"phase_{ph}"](args)


if __name__ == "__main__":
    main()

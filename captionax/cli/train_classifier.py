"""Train the style/domain caption classifiers.

Covers the reference classifier family (SURVEY.md §2.6):
- ``--kind style3``  — BertClassifer, 3-way factual/humour/romantic
  (bert_text_classifier.py);
- ``--kind style4``  — 4-way f/h/r/CC (style_classifier_all.py);
- ``--kind domain``  — one class per CC domain (cc_domain_classifier.py);
- ``--kind small``   — the embedding+linear StyleClassifer (classifier.py);
- ``--kind essence`` — siamese same-image pair classifier
  (bert_essence_classifier.py).

The BERT trunk is randomly initialized (no pretrained downloads here) or
loaded from a user-supplied HF state_dict via --bert-weights.

    python -m captionax.cli.train_classifier --kind small --synthetic
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from captionax.cli.common import make_parser, parse_configs, resolve_vocab
from captionax.data.cc import load_cc_captions
from captionax.data.flickr import STYLE_NAMES
from captionax.cli.common import resolve_flickr_data
from captionax.models.classifiers import (
    STYLE_LABELS,
    essence_classifier_apply,
    essence_classifier_init,
    small_style_classifier_apply,
    small_style_classifier_init,
    style_classifier_apply,
    style_classifier_init,
)
from captionax.train.logging import MetricLogger
from captionax.train.state import create_train_state, make_optimizer


def _style_examples(data, vocab, indices, rng):
    """(ids [T], label) pairs across the three styles."""
    for i in indices:
        for style in STYLE_NAMES:
            yield data.caption_ids(style, i, rng=rng), STYLE_LABELS[style]


def main(argv=None):
    parser = make_parser(__doc__)
    parser.add_argument("--kind", type=str, default="small",
                        choices=["style3", "style4", "domain", "small", "essence"])
    parser.add_argument("--bert-hidden", type=int, default=768)
    parser.add_argument("--bert-layers", type=int, default=12)
    parser.add_argument("--bert-weights", type=str, default="")
    parser.add_argument("--save", type=str, default="",
                        help="pickle the trained classifier params here "
                             "(consumed by train_hypernet --mixup)")
    parser.add_argument("--warm-start", type=str, default="",
                        help="pickle of a previously trained BERT-family "
                             "classifier (same --bert-hidden/--bert-layers); "
                             "its 'bert' trunk initializes this one.  The "
                             "reference gets token semantics from pretrained "
                             "bert-base (bert_essence_classifier.py:40); with "
                             "no downloads here, a trunk trained on the "
                             "style task is the available substitute")
    args = parser.parse_args(argv)
    model_cfg, train_cfg, data_cfg = parse_configs(args)

    vocab = resolve_vocab(data_cfg)
    V = len(vocab)
    data = resolve_flickr_data(data_cfg, vocab, train_cfg.max_len)
    key = jax.random.PRNGKey(train_cfg.seed)

    # 90/10 held-out split (by image for styles, by row for domains) so
    # every kind reports a final held-out accuracy — the reference never
    # publishes one (bert_text_classifier.py logs val acc to W&B only)
    if args.kind == "domain":
        rows = load_cc_captions(data_cfg.cc_captions)
        domains = sorted({d for _, _, d in rows})
        dom_id = {d: i for i, d in enumerate(domains)}
        num_class = len(domains)
        all_ex = [
            (np.array(vocab.encode(cap)[: train_cfg.max_len]), dom_id[d])
            for _, cap, d in rows
        ]
        rs = np.random.RandomState(train_cfg.seed)
        perm = rs.permutation(len(all_ex))
        cut = max(1, len(all_ex) // 10)
        examples = [all_ex[i] for i in perm[cut:]]
        heldout = [all_ex[i] for i in perm[:cut]]
    else:
        num_class = {"style3": 3, "style4": 4, "small": 3}.get(args.kind, 2)
        import random as _r

        rng = _r.Random(train_cfg.seed)
        rs = np.random.RandomState(train_cfg.seed)
        perm = rs.permutation(len(data))
        cut = max(1, len(data) // 10)
        examples = list(_style_examples(data, vocab, perm[cut:], rng))
        heldout = list(_style_examples(data, vocab, perm[:cut], rng))
        if args.kind == "style4":
            # 4th class: Conceptual Captions text, label 3
            # (style_classifier_all.py:41-45 {'f':0,'h':1,'r':2,'CC':3})
            import os

            assert os.path.exists(data_cfg.cc_captions), (
                "--kind style4 needs --cc-captions (the CC class)")
            cc_ex = [
                (np.array(vocab.encode(cap)[: train_cfg.max_len]), 3)
                for _, cap, _ in load_cc_captions(data_cfg.cc_captions)
            ]
            ccut = max(1, len(cc_ex) // 10)
            cperm = rs.permutation(len(cc_ex))
            examples += [cc_ex[i] for i in cperm[ccut:]]
            heldout += [cc_ex[i] for i in cperm[:ccut]]
    print(f"kind={args.kind} classes={num_class} examples={len(examples)} "
          f"heldout={len(heldout)}")

    if args.kind == "small":
        params = small_style_classifier_init(key, V, model_cfg.embed_size, num_class)
        apply_fn = lambda p, ids, mask: small_style_classifier_apply(p, ids)  # noqa: E731
    elif args.kind == "essence":
        params = essence_classifier_init(key, V, args.bert_hidden, args.bert_layers)
        apply_fn = None
    else:
        params = style_classifier_init(key, V, num_class, args.bert_hidden,
                                       args.bert_layers)
        if args.bert_weights:
            import torch

            from captionax.models.classifiers import bert_trunk_from_hf_state_dict

            params["bert"] = bert_trunk_from_hf_state_dict(
                torch.load(args.bert_weights, map_location="cpu"),
                args.bert_hidden, args.bert_layers,
            )
        apply_fn = style_classifier_apply
    if args.warm_start and args.kind != "small":
        import pickle

        with open(args.warm_start, "rb") as f:
            donor = pickle.load(f)
        # user-input validation must survive `python -O` (asserts don't)
        if "bert" not in donor:
            raise SystemExit("--warm-start pickle has no 'bert' trunk")
        donor_shapes = jax.tree_util.tree_map(lambda x: x.shape, donor["bert"])
        mine = jax.tree_util.tree_map(lambda x: x.shape, params["bert"])
        if donor_shapes != mine:
            raise SystemExit(
                f"--warm-start trunk dims mismatch: {args.warm_start} vs "
                f"--bert-hidden {args.bert_hidden} --bert-layers "
                f"{args.bert_layers}")
        params["bert"] = jax.tree_util.tree_map(jnp.asarray, donor["bert"])
        print(f"warm-started {args.kind} trunk from {args.warm_start}")

    tx = make_optimizer(train_cfg.lr, train_cfg.grad_clip)
    state = create_train_state(params, tx)
    logger = MetricLogger(train_cfg.checkpoint_dir, args.run_name)

    def pad_to(ids, T):
        out = np.zeros((T,), np.int32)
        out[: min(len(ids), T)] = ids[:T]
        return out

    T = train_cfg.max_len

    if args.kind == "essence":
        # pairs: same image across styles (label 1) vs different (label 0);
        # held-out images (the 10% cut above) never appear in training pairs
        import random as _r

        rng = _r.Random(0)
        train_imgs = [int(i) for i in perm[cut:]]
        held_imgs = [int(i) for i in perm[:cut]]

        def make_pairs(imgs, prng):
            a, b, y = [], [], []
            for i in imgs:
                same = prng.random() < 0.5
                j = i if same else prng.choice(imgs)
                a.append(pad_to(data.caption_ids("factual", i, rng=prng), T))
                b.append(pad_to(data.caption_ids("humour", j, rng=prng), T))
                y.append(1 if (same or j == i) else 0)
            return np.stack(a), np.stack(b), np.array(y, np.int32)

        def batches(epoch):
            idx = list(train_imgs)
            rng.shuffle(idx)
            for s in range(0, len(idx) - train_cfg.batch_size, train_cfg.batch_size):
                chunk = idx[s : s + train_cfg.batch_size]
                a, b, y = [], [], []
                for i in chunk:
                    same = rng.random() < 0.5
                    j = i if same else rng.choice(idx)
                    a.append(pad_to(data.caption_ids("factual", i, rng=rng), T))
                    b.append(pad_to(data.caption_ids("humour", j, rng=rng), T))
                    y.append(1 if same else 0)
                yield np.stack(a), np.stack(b), np.array(y, np.int32)

        @jax.jit
        def step(state, a, b, y):
            def loss_fn(p):
                probs = essence_classifier_apply(
                    p, a, (a != 0).astype(jnp.float32),
                    b, (b != 0).astype(jnp.float32),
                )
                return -jnp.mean(
                    jnp.log(probs[jnp.arange(len(y)), y] + 1e-9)
                )

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            return state.apply_gradients(grads, tx), loss

        gstep = 0
        for epoch in range(train_cfg.max_epochs):
            for a, b, y in batches(epoch):
                state, loss = step(state, a, b, y)
                gstep += 1
                if gstep % train_cfg.log_every == 0:
                    logger.log({"train_loss": float(loss)}, gstep)
            print(f"epoch {epoch} loss {float(loss):.4f}")
        ha, hb, hy = make_pairs(held_imgs, _r.Random(train_cfg.seed + 7))
        hp = np.asarray(essence_classifier_apply(
            state.params, ha, (ha != 0).astype(jnp.float32),
            hb, (hb != 0).astype(jnp.float32)))
        hacc = float((hp.argmax(-1) == hy).mean())
        logger.log({"heldout_acc": hacc})
        print(f"heldout pair accuracy: {hacc:.4f} ({len(hy)} pairs)")
        _maybe_save(args.save, state.params)
        return state, hacc

    import random as _r

    rng = _r.Random(1)

    def batches():
        ex = list(examples)
        rng.shuffle(ex)
        for s in range(0, len(ex) - train_cfg.batch_size, train_cfg.batch_size):
            chunk = ex[s : s + train_cfg.batch_size]
            ids = np.stack([pad_to(np.asarray(c[0]), T) for c in chunk])
            labels = np.array([c[1] for c in chunk], np.int32)
            yield ids, labels

    @jax.jit
    def step(state, ids, labels):
        def loss_fn(p):
            probs = apply_fn(p, ids, (ids != 0).astype(jnp.float32))
            return -jnp.mean(jnp.log(probs[jnp.arange(len(labels)), labels] + 1e-9))

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads, tx), loss

    gstep = 0
    for epoch in range(train_cfg.max_epochs):
        correct = total = 0
        for ids, labels in batches():
            state, loss = step(state, ids, labels)
            gstep += 1
            if gstep % train_cfg.log_every == 0:
                probs = apply_fn(state.params, ids, (ids != 0).astype(jnp.float32))
                correct += int((np.asarray(probs).argmax(-1) == labels).sum())
                total += len(labels)
                logger.log({"train_loss": float(loss)}, gstep)
        acc = correct / max(total, 1)
        print(f"epoch {epoch} loss {float(loss):.4f} sampled-acc {acc:.3f}")

    # held-out accuracy (fixed padded batch shape to reuse one compile)
    Bs = train_cfg.batch_size
    correct = total = 0
    for s in range(0, len(heldout), Bs):
        chunk = heldout[s : s + Bs]
        ids = np.zeros((Bs, T), np.int32)
        for i, c in enumerate(chunk):
            ids[i] = pad_to(np.asarray(c[0]), T)
        labels = np.array([c[1] for c in chunk], np.int32)
        probs = np.asarray(
            apply_fn(state.params, ids, (ids != 0).astype(jnp.float32))
        )[: len(chunk)]
        correct += int((probs.argmax(-1) == labels).sum())
        total += len(labels)
    hacc = correct / max(total, 1)
    logger.log({"heldout_acc": hacc})
    print(f"heldout accuracy: {hacc:.4f} ({total} examples, "
          f"chance {1.0 / num_class:.3f})")
    _maybe_save(args.save, state.params)
    return state, hacc


def _maybe_save(path: str, params) -> None:
    if not path:
        return
    import pickle

    host = jax.tree_util.tree_map(np.asarray, params)
    with open(path, "wb") as f:
        pickle.dump(host, f)
    print(f"saved classifier params -> {path}")


if __name__ == "__main__":
    main()

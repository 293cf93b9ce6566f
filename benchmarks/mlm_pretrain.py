"""Masked-LM pretrain of the classifier BERT trunk on real caption text.

VERDICT r3 stretch #8, second lever: the reference's essence classifier
gets token semantics from pretrained bert-base
(/root/reference/bert_essence_classifier.py:40); with no downloads in
this image the trunk is random-init and the siamese pair task stays at
chance (classifier_rows_warm.json: 0.46 random-init, 0.46 style3-warm).
This pretrains the SAME trunk (bert_trunk_init shapes, exact
--bert-hidden/--bert-layers dims) as a masked LM over the real caption
corpus (factual_train.txt + the CC seen split) using the LaBERT masking
machinery (models/labert.py mask_tokens), then saves a
``{"bert": trunk}`` pickle consumable by
``train_classifier --warm-start`` / ``classifier_rows.py --kinds
essence_mlm``.

[MASK] convention: the donatable trunk must keep word_emb at exactly
V=9684 rows (the essence classifier's shapes), so unlike train_labert
(which appends mask_id=len(vocab)) the mask token here is in-vocab
``<unk>`` (id 3) — semantically "token unknown here".

Usage:
    python benchmarks/mlm_pretrain.py [--epochs 2] [--hidden 256]
        [--layers 4] [--platform cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cc_gru_vs_hypernet import split_files  # noqa: E402

OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_parity")


def load_corpus(vocab, max_len):
    from captionax.core.vocab import extract_factual_caption_lines
    from captionax.data.cc import load_cc_captions

    seen_p, _ = split_files(OUT_DIR)
    texts = extract_factual_caption_lines(
        "/root/reference/data/factual_train.txt")
    texts += [cap for _, cap, _ in load_cc_captions(seen_p)]
    rows = np.zeros((len(texts), max_len), np.int32)
    for i, t in enumerate(texts):
        ids = vocab.encode(t)[:max_len]
        rows[i, : len(ids)] = ids
    return rows


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--max-len", type=int, default=25)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--heldout", type=int, default=2048)
    p.add_argument("--limit", type=int, default=0,
                   help="smoke-scale: cap the corpus at N captions (0 = all)")
    p.add_argument("--out", default=os.path.join(OUT_DIR, "clf_mlm.pkl"))
    p.add_argument("--platform", default="default", choices=["default", "cpu"])
    args = p.parse_args(argv)
    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        from captionax.core.runtime import setup_runtime

        setup_runtime()
    import jax
    import jax.numpy as jnp

    from captionax.core.vocab import load_vocab_pickle
    from captionax.models.classifiers import (
        bert_trunk_apply,
        bert_trunk_init,
    )
    from captionax.models.labert import mask_tokens
    from captionax.train.state import create_train_state, make_optimizer

    MASK_ID = 3  # <unk> — see module docstring

    vocab = load_vocab_pickle("/root/reference/data/vocab.pkl")
    V = len(vocab)
    rows = load_corpus(vocab, args.max_len)
    if args.limit:
        rows = rows[: args.limit]
    rng = np.random.RandomState(args.seed)
    perm = rng.permutation(len(rows))
    rows = rows[perm]
    held, train = rows[: args.heldout], rows[args.heldout:]
    print(f"corpus: {len(train)} train / {len(held)} held-out captions, "
          f"V={V}, T={args.max_len}", flush=True)

    key = jax.random.PRNGKey(args.seed)
    k_init, key = jax.random.split(key)
    params = {
        "bert": bert_trunk_init(k_init, V, args.hidden, args.layers),
        "mlm_b": jnp.zeros((V,)),
    }

    def mlm_loss(p, ids, step_rng):
        attn = (ids != 0).astype(jnp.float32)
        masked_ids, pos = mask_tokens(step_rng, ids, MASK_ID)
        seq, _ = bert_trunk_apply(p["bert"], masked_ids, attn)
        # tied softmax head: the word embedding transposed (BERT-style)
        logits = seq @ p["bert"]["word_emb"].T + p["mlm_b"]
        logp = jax.nn.log_softmax(logits)
        ll = jnp.take_along_axis(logp, ids[..., None], -1)[..., 0]
        posf = pos.astype(jnp.float32)
        loss = -(ll * posf).sum() / jnp.maximum(posf.sum(), 1.0)
        acc = ((jnp.argmax(logits, -1) == ids) * posf).sum() / jnp.maximum(
            posf.sum(), 1.0)
        return loss, acc

    tx = make_optimizer(args.lr)
    state = create_train_state(params, tx)

    @jax.jit
    def train_step(state, ids, step_rng):
        (loss, acc), grads = jax.value_and_grad(
            mlm_loss, has_aux=True)(state.params, ids, step_rng)
        return state.apply_gradients(grads, tx), loss, acc

    eval_step = jax.jit(mlm_loss)

    B = args.batch_size
    log = []
    t0 = time.time()
    for epoch in range(args.epochs):
        order = np.random.RandomState(args.seed + 1 + epoch).permutation(
            len(train))
        losses, accs = [], []
        for s in range(len(train) // B):
            key, k_step = jax.random.split(key)
            batch = jnp.asarray(train[order[s * B:(s + 1) * B]])
            state, loss, acc = train_step(state, batch, k_step)
            if s % 50 == 0:
                print(f"epoch {epoch} step {s} loss {float(loss):.3f} "
                      f"masked-acc {float(acc):.3f}", flush=True)
            losses.append(float(loss))
            accs.append(float(acc))
        # held-out masked-token accuracy (fixed eval rng per epoch)
        ev_l, ev_a = [], []
        for s in range(len(held) // B):
            l, a = eval_step(state.params, jnp.asarray(held[s * B:(s + 1) * B]),
                             jax.random.PRNGKey(1234 + s))
            ev_l.append(float(l))
            ev_a.append(float(a))
        row = {"epoch": epoch, "train_loss": float(np.mean(losses)),
               "train_masked_acc": float(np.mean(accs)),
               "held_loss": float(np.mean(ev_l)),
               "held_masked_acc": float(np.mean(ev_a)),
               "seconds": round(time.time() - t0, 1)}
        log.append(row)
        print(row, flush=True)

    import pickle

    with open(args.out, "wb") as f:
        pickle.dump({"bert": jax.device_get(state.params["bert"])}, f)
    with open(os.path.join(OUT_DIR, "mlm_pretrain.json"), "w") as f:
        json.dump({"log": log, "dims": f"bert {args.hidden}x{args.layers}",
                   "corpus": int(len(train)), "mask_id": MASK_ID}, f, indent=1)
    print("saved MLM trunk ->", args.out)


if __name__ == "__main__":
    main()

"""Train the LSTM captioner family.

One CLI covering the reference's four LSTM scripts:
- ``--variant seq``       — train_lstm.py: EncoderLstm global feature +
  plain seq2seq LSTM (DecoderLstm);
- ``--variant attention`` — train_attention_lstm.py / train_lstm_attention.py:
  AttentionLstm over raw region features;
- ``--variant sat``       — the Show-Attend-Tell DecoderWithAttention
  (later.py:1-222) with gated attention;
- ``--variant net``       — train_lstm_net.py: Lstm_net (feature as first
  LSTM token).

    python -m captionax.cli.train_lstm --variant attention --synthetic
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from captionax.cli.common import (
    build_encoder,
    make_feature_fn,
    make_parser,
    parse_configs,
    resolve_flickr_data,
    resolve_vocab,
)
from captionax.data.loader import BatchLoader
from captionax.data.transforms import preprocess_images
from captionax.eval.metrics import CaptionMetrics
from captionax.models import decoder as dec
from captionax.models.cell_decoders import (
    show_attend_tell_forward,
    show_attend_tell_init,
    show_attend_tell_sample,
)
from captionax.models.encoder import encoder_cnn, resnet_apply
from captionax.train.logging import MetricLogger
from captionax.train.losses import cross_entropy_loss
from captionax.train.state import create_train_state, get_lr, make_optimizer

VARIANTS = ("seq", "attention", "sat", "net")


def main(argv=None):
    parser = make_parser(__doc__)
    parser.add_argument("--variant", type=str, default="attention",
                        choices=VARIANTS)
    parser.add_argument("--encoder-weights", type=str, default="")
    args = parser.parse_args(argv)
    model_cfg, train_cfg, data_cfg = parse_configs(args)

    vocab = resolve_vocab(data_cfg)
    V = len(vocab)
    data = resolve_flickr_data(data_cfg, vocab, train_cfg.max_len)
    print(f"variant={args.variant} vocab={V} images={len(data)}")

    key = jax.random.PRNGKey(train_cfg.seed)
    k1, k2 = jax.random.split(key)
    E, H = model_cfg.embed_size, model_cfg.hidden_size
    encoder_params = build_encoder(model_cfg, k2, args.encoder_weights)
    encode_regions = jax.jit(
        lambda imgs: encoder_cnn(encoder_params, preprocess_images(imgs))
    )
    encode_global = jax.jit(
        lambda imgs: resnet_apply(
            encoder_params, preprocess_images(imgs)
        ).mean(axis=(1, 2))
    )

    if args.variant == "seq" or args.variant == "net":
        params = {
            "proj": {
                "w": jax.random.normal(jax.random.fold_in(k1, 1), (2048, E)) * 0.02,
                "b": jnp.zeros((E,)),
            },
            "dec": dec.seq_lstm_init(k1, E, H, V),
        }

        def forward(params, batch):
            feat = batch["features"] @ params["proj"]["w"] + params["proj"]["b"]
            logits = dec.seq_lstm_forward(params["dec"], feat, batch["captions"])
            return logits, batch["captions"]  # logits align with captions

        encode = encode_global
    elif args.variant == "attention":
        params = dec.attention_lstm_init(k1, 2048, E, H, V)

        def forward(params, batch):
            logits, _ = dec.lstm_teacher_forced(
                params, batch["features"], batch["captions"]
            )
            return logits, batch["captions"]

        encode = encode_regions
    else:  # sat
        params = show_attend_tell_init(k1, 2048, E, H, H, V)

        def forward(params, batch):
            logits, _ = show_attend_tell_forward(
                params, batch["features"], batch["captions"]
            )
            return logits, batch["captions"][:, 1:]  # predicts next token

        encode = encode_regions

    featurize = make_feature_fn(encode, train_cfg)
    tx = make_optimizer(train_cfg.lr, train_cfg.grad_clip)
    state = create_train_state(params, tx)
    logger = MetricLogger(train_cfg.checkpoint_dir, args.run_name)

    @jax.jit
    def train_step(state, batch):
        def loss_fn(p):
            logits, targets = forward(p, batch)
            return cross_entropy_loss(logits, targets)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads, tx), loss

    train_idx, val_idx, _ = data.splits(seed=train_cfg.seed)
    step = 0
    for epoch in range(train_cfg.max_epochs):
        for batch in BatchLoader(
            data.batches(train_idx, train_cfg.batch_size, style="factual",
                         seed=train_cfg.seed + epoch)
        ):
            batch = dict(batch)
            batch["features"] = featurize(batch)
            batch.pop("images", None)
            db = {k: batch[k] for k in ("features", "captions")}
            state, loss = train_step(state, db)
            step += 1
            if step % train_cfg.log_every == 0:
                logger.log({"train_loss": float(loss), "epoch": epoch}, step)
        print(f"epoch {epoch} loss {float(loss):.4f} lr {get_lr(state):.2e}")

    # held-out validation: TF metrics for every variant (the reference
    # logs metric_score on logits each step, utils.py:229-282 — here
    # once, corpus-level, off the step path), plus free-running greedy
    # metrics where the reference has a greedy path (attention:
    # decoderlstm.py:264-285; sat: later.py:117-165)
    tf_quality = CaptionMetrics(vocab)
    greedy_quality = CaptionMetrics(vocab) if args.variant in (
        "attention", "sat") else None
    eval_forward = jax.jit(forward)
    greedy_fn = jax.jit(
        lambda p, f: dec.lstm_greedy(p, f, max_len=train_cfg.max_len)
    ) if args.variant == "attention" else None
    val_losses = []
    for batch in BatchLoader(
        data.batches(val_idx, train_cfg.batch_size, style="factual",
                     seed=0, shuffle=False, drop_remainder=False)
    ):
        batch = dict(batch)
        batch["features"] = featurize(batch)
        batch.pop("images", None)
        db = {k: batch[k] for k in ("features", "captions")}
        logits, targets = eval_forward(state.params, db)
        val_losses.append(float(cross_entropy_loss(logits, targets)))
        tf_quality.add_batch_logits(np.asarray(targets), np.asarray(logits))
        if args.variant == "attention":
            ids = greedy_fn(state.params, db["features"])
            greedy_quality.add_batch_ids(np.asarray(db["captions"]),
                                         np.asarray(ids))
        elif args.variant == "sat":
            ids = show_attend_tell_sample(state.params, db["features"],
                                          max_len=train_cfg.max_len)
            greedy_quality.add_batch_ids(np.asarray(db["captions"]),
                                         np.asarray(ids))
    results = {}
    if val_losses:
        results["val_loss_tf"] = sum(val_losses) / len(val_losses)
        results.update(
            {f"tf_{k}": v for k, v in tf_quality.compute().items()}
        )
        if greedy_quality is not None:
            results.update(
                {f"greedy_{k}": v for k, v in greedy_quality.compute().items()}
            )
        logger.log(results, step)
        print("val:", {k: round(v, 4) for k, v in results.items()})
    # final checkpoint (every reference LSTM trainer attaches a
    # Lightning ModelCheckpoint, e.g. train_attention_lstm.py /
    # train_lstm.py __main__ blocks)
    from captionax.train.checkpoint import save_checkpoint

    save_checkpoint(train_cfg.checkpoint_dir, step, state.params)
    return state, results


if __name__ == "__main__":
    main()

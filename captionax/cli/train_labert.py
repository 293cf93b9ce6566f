"""Train the LaBERT masked-LM transformer baseline.

Equivalent of ``python train_baseline_labert.py``
(/root/reference/train_baseline_labert.py): masked-token prediction over
[image ‖ caption] with label smoothing 0.1, length-bucket token types,
plateau LR on val loss.  A [MASK] token is appended to the vocab.

    python -m captionax.cli.train_labert --synthetic --max-epochs 2 \
        --hidden 128 --num-layers 2
"""

from __future__ import annotations

import jax
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
from captionax.models.encoder import encoder_cnn
from captionax.models.labert import (
    labert_init,
    labert_loss,
    length_bucket,
    mask_predict_decode,
)
from captionax.train.logging import MetricLogger
from captionax.train.state import PlateauScheduler, create_train_state, get_lr, make_optimizer, set_lr


def add_type_ids(batches):
    for b in batches:
        b = dict(b)
        lengths = b["lengths"]
        b["token_type_ids"] = np.asarray(
            [length_bucket(int(l)) + 2 for l in lengths], np.int32
        )[:, None].repeat(b["captions"].shape[1], 1)
        yield b


def main(argv=None):
    parser = make_parser(__doc__)
    parser.add_argument("--hidden", type=int, default=768)
    parser.add_argument("--bert-layers", type=int, default=12)
    parser.add_argument("--bert-heads", type=int, default=12)
    parser.add_argument("--encoder-weights", type=str, default="")
    parser.add_argument(
        "--pipe", type=int, default=1,
        help="pipeline-parallel stages for the BERT stack (train step "
             "only; needs --pipe devices and --bert-layers %% pipe == 0)")
    parser.add_argument(
        "--pipe-micro", type=int, default=0,
        help="microbatches per step (default 2*pipe; batch size must "
             "divide by it)")
    parser.add_argument(
        "--seq", type=int, default=1,
        help="sequence-parallel shards for the BERT token axis (train "
             "step only; needs --seq devices; text columns are pad-"
             "extended so regions+T divide by it — loss-neutral). "
             "Mutually exclusive with --pipe")
    parser.add_argument(
        "--seq-ring", action="store_true",
        help="with --seq: ring-attention schedule (ppermute K/V blocks, "
             "O(T^2/S^2) score memory) instead of all-gather K/V")
    args = parser.parse_args(argv)
    model_cfg, train_cfg, data_cfg = parse_configs(args)

    vocab = resolve_vocab(data_cfg)
    mask_id = len(vocab)  # appended [MASK]
    data = resolve_flickr_data(data_cfg, vocab, train_cfg.max_len)
    print(f"vocab={len(vocab)}+[MASK] images={len(data)}")

    key = jax.random.PRNGKey(train_cfg.seed)
    k1, k2 = jax.random.split(key)
    params = labert_init(
        k1, len(vocab) + 1, hidden=args.hidden,
        num_layers=args.bert_layers, num_heads=args.bert_heads,
        intermediate=args.hidden * 4,
    )
    encoder_params = build_encoder(model_cfg, k2, args.encoder_weights)
    tx = make_optimizer(train_cfg.lr, train_cfg.grad_clip)
    state = create_train_state(params, tx)
    logger = MetricLogger(train_cfg.checkpoint_dir, args.run_name)
    sched = PlateauScheduler(cooldown=train_cfg.plateau_cooldown,
                             factor=train_cfg.plateau_factor)

    encode = jax.jit(lambda imgs: encoder_cnn(encoder_params, preprocess_images(imgs)))
    featurize = make_feature_fn(encode, train_cfg)

    # --pipe N: run the BERT stack as an N-stage GPipe schedule
    # (parallel/pipeline.py) in the TRAIN step — the loss is identical to
    # the sequential stack (test-enforced), so logs/checkpoints are
    # interchangeable.  Validation keeps the sequential path: its last
    # batch is ragged (drop_remainder=False) and the fixed-shape schedule
    # wants B %% n_micro == 0.
    enc = None
    if args.pipe > 1:
        from captionax.parallel.pipeline import (
            pipeline_mesh, pipelined_bert_encoder,
        )

        n_micro = args.pipe_micro or 2 * args.pipe
        if args.bert_layers % args.pipe:
            parser.error(f"--bert-layers {args.bert_layers} must divide "
                         f"by --pipe {args.pipe}")
        if train_cfg.batch_size % n_micro:
            parser.error(f"--batch-size {train_cfg.batch_size} must divide "
                         f"by --pipe-micro {n_micro}")
        if len(jax.devices()) < args.pipe:
            parser.error(f"--pipe {args.pipe} needs {args.pipe} devices, "
                         f"have {len(jax.devices())}")
        enc = pipelined_bert_encoder(
            pipeline_mesh(n_pipe=args.pipe), n_micro=n_micro,
            num_heads=args.bert_heads,
        )

    # --seq N: shard the 49+T token axis over a ``seq`` mesh axis
    # (parallel/sequence.py) in the TRAIN step; the loss is identical to
    # the sequential stack (test-enforced).  Text columns are padded with
    # pad-id (attention 0, never selected for masking) so the total token
    # count divides by N — loss-neutral by construction.
    n_seq = max(1, args.seq)
    if n_seq > 1:
        from captionax.parallel.sequence import (
            sequence_mesh, sequence_parallel_bert_encoder,
        )

        if args.pipe > 1:
            parser.error("--seq and --pipe are mutually exclusive")
        if len(jax.devices()) < n_seq:
            parser.error(f"--seq {n_seq} needs {n_seq} devices, "
                         f"have {len(jax.devices())}")
        enc = sequence_parallel_bert_encoder(
            sequence_mesh(n_seq=n_seq), num_heads=args.bert_heads,
            ring=args.seq_ring,
        )

    def pad_for_seq(caps, types, n_regions):
        """Pad text columns so image regions + T text divide by --seq."""
        if n_seq == 1:
            return caps, types
        short = (-(n_regions + caps.shape[1])) % n_seq
        if not short:
            return caps, types
        pad = np.zeros((caps.shape[0], short), caps.dtype)  # pad_id = 0
        return (np.concatenate([caps, pad], 1),
                np.concatenate([types, pad.astype(types.dtype)], 1))

    @jax.jit
    def train_step(state, feats, caps, types, rng):
        def loss_fn(p):
            return labert_loss(p, feats, caps, types, rng, mask_id,
                               num_heads=args.bert_heads, encoder_fn=enc)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads, tx), loss

    @jax.jit
    def val_step(params, feats, caps, types, rng):
        return labert_loss(params, feats, caps, types, rng, mask_id,
                           num_heads=args.bert_heads)

    train_idx, val_idx, _ = data.splits(seed=train_cfg.seed)
    step = 0
    for epoch in range(train_cfg.max_epochs):
        for batch in BatchLoader(add_type_ids(
            data.batches(train_idx, train_cfg.batch_size, style="factual",
                         seed=train_cfg.seed + epoch)
        )):
            feats = featurize(batch)
            caps, types = pad_for_seq(
                batch["captions"], batch["token_type_ids"], feats.shape[1]
            )
            state, loss = train_step(
                state, feats, caps, types, jax.random.PRNGKey(step),
            )
            step += 1
            if step % train_cfg.log_every == 0:
                logger.log({"train_loss": float(loss), "epoch": epoch}, step)
        vals = []
        for batch in BatchLoader(add_type_ids(
            data.batches(val_idx, train_cfg.batch_size, style="factual",
                         seed=0, shuffle=False, drop_remainder=False)
        )):
            feats = featurize(batch)
            vals.append(float(val_step(
                state.params, feats, batch["captions"],
                batch["token_type_ids"], jax.random.PRNGKey(0),
            )))
        val_loss = float(np.mean(vals)) if vals else float("nan")
        lr = sched.step(val_loss, get_lr(state))
        if lr != get_lr(state):
            state = set_lr(state, lr)
        logger.log({"val_loss": val_loss, "epoch": epoch}, step)
        print(f"epoch {epoch} train {float(loss):.4f} val {val_loss:.4f}")

    # mask-predict decode a few images as a smoke check (skipped when the
    # validation split is empty at tiny dataset sizes)
    sample = next(iter(BatchLoader(add_type_ids(
        data.batches(val_idx, min(4, train_cfg.batch_size), style="factual",
                     seed=0, shuffle=False, drop_remainder=False)
    ))), None)
    if sample is None:
        print("no validation batches; skipping mask-predict smoke")
        return state
    feats = featurize(sample)
    ids = mask_predict_decode(state.params, feats, mask_id, length=12)
    quality = CaptionMetrics(vocab)
    quality.add_batch_ids(np.asarray(sample["captions"]), np.asarray(ids))
    print("mask-predict metrics:", {k: round(v, 4) for k, v in quality.compute().items()})
    return state


if __name__ == "__main__":
    main()

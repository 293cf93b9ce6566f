"""Train the CATR (DETR-style encoder-decoder) transformer baseline.

Equivalent of ``python cc_train_catr.py`` (/root/reference/cc_train_catr.py
— whose LightningModule is broken in the snapshot: undefined
self.image_encoder/self.generator, missing dataloader module; this is the
working realization of its intent): causal teacher-forced CE over CC or
FlickrStyle captions with the reference CATR hyperparameters
(hidden 256, 8 heads, 6+6 layers, configuration.py).

    python -m captionax.cli.train_catr --synthetic --max-epochs 2 \
        --enc-layers 2 --dec-layers 2
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
from captionax.models.catr import catr_forward, catr_greedy, catr_init
from captionax.models.encoder import encoder_cnn
from captionax.train.logging import MetricLogger
from captionax.train.losses import cross_entropy_loss
from captionax.train.state import create_train_state, get_lr, make_optimizer


def main(argv=None):
    parser = make_parser(__doc__)
    parser.add_argument("--hidden", type=int, default=256)
    parser.add_argument("--heads", type=int, default=8)
    parser.add_argument("--enc-layers", type=int, default=6)
    parser.add_argument("--dec-layers", type=int, default=6)
    parser.add_argument("--encoder-weights", type=str, default="")
    parser.add_argument(
        "--pipe", type=int, default=1,
        help="pipeline-parallel stages for BOTH transformer halves "
             "(train step only; needs --pipe devices and enc/dec layer "
             "counts divisible by it)")
    parser.add_argument(
        "--pipe-micro", type=int, default=0,
        help="microbatches per step (default 2*pipe; batch size must "
             "divide by it)")
    args = parser.parse_args(argv)
    model_cfg, train_cfg, data_cfg = parse_configs(args)

    vocab = resolve_vocab(data_cfg)
    data = resolve_flickr_data(data_cfg, vocab, train_cfg.max_len)
    print(f"vocab={len(vocab)} images={len(data)}")

    key = jax.random.PRNGKey(train_cfg.seed)
    k1, k2 = jax.random.split(key)
    params = catr_init(
        k1, len(vocab), hidden=args.hidden, num_heads=args.heads,
        ff=2048, enc_layers=args.enc_layers, dec_layers=args.dec_layers,
    )
    encoder_params = build_encoder(model_cfg, k2, args.encoder_weights)
    tx = make_optimizer(train_cfg.lr, train_cfg.grad_clip)
    state = create_train_state(params, tx)
    logger = MetricLogger(train_cfg.checkpoint_dir, args.run_name)

    encode = jax.jit(lambda imgs: encoder_cnn(encoder_params, preprocess_images(imgs)))
    featurize = make_feature_fn(encode, train_cfg)

    # --pipe N: both DETR halves as N-stage GPipe schedules
    # (parallel/pipeline.py pipelined_catr_stacks) in the TRAIN step —
    # the loss equals the sequential stacks (test-enforced).  Validation
    # decode keeps the sequential path (autoregressive greedy re-runs the
    # decoder per step; the fixed-shape schedule wants B % n_micro == 0).
    enc_fn = dec_fn = None
    if args.pipe > 1:
        from captionax.parallel.pipeline import (
            pipeline_mesh, pipelined_catr_stacks,
        )

        n_micro = args.pipe_micro or 2 * args.pipe
        for nm, n in (("--enc-layers", args.enc_layers),
                      ("--dec-layers", args.dec_layers)):
            if n % args.pipe:
                parser.error(f"{nm} {n} must divide by --pipe {args.pipe}")
        if train_cfg.batch_size % n_micro:
            parser.error(f"--batch-size {train_cfg.batch_size} must "
                         f"divide by --pipe-micro {n_micro}")
        if len(jax.devices()) < args.pipe:
            parser.error(f"--pipe {args.pipe} needs {args.pipe} devices, "
                         f"have {len(jax.devices())}")
        enc_fn, dec_fn = pipelined_catr_stacks(
            pipeline_mesh(n_pipe=args.pipe), n_micro=n_micro,
            num_heads=args.heads,
        )

    @jax.jit
    def train_step(state, feats, caps):
        def loss_fn(p):
            # inputs caps[:, :-1] predict caps[:, 1:] (causal shift)
            logits = catr_forward(p, feats, caps[:, :-1],
                                  encoder_fn=enc_fn, decoder_fn=dec_fn,
                                  num_heads=args.heads)
            return cross_entropy_loss(logits, caps[:, 1:])

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads, tx), loss

    train_idx, val_idx, _ = data.splits(seed=train_cfg.seed)
    step = 0
    for epoch in range(train_cfg.max_epochs):
        for batch in BatchLoader(
            data.batches(train_idx, train_cfg.batch_size, style="factual",
                         seed=train_cfg.seed + epoch)
        ):
            feats = featurize(batch)
            state, loss = train_step(state, feats, batch["captions"])
            step += 1
            if step % train_cfg.log_every == 0:
                logger.log({"train_loss": float(loss), "epoch": epoch}, step)
        print(f"epoch {epoch} train_loss {float(loss):.4f} lr {get_lr(state):.2e}")

    greedy_fn = jax.jit(
        lambda p, f: catr_greedy(p, f, max_len=train_cfg.max_len,
                                 num_heads=args.heads)
    )
    quality = CaptionMetrics(vocab)
    n_val = 0
    for sample in BatchLoader(
        data.batches(val_idx, train_cfg.batch_size, style="factual",
                     seed=0, shuffle=False, drop_remainder=False)
    ):
        feats = featurize(sample)
        ids = greedy_fn(state.params, feats)
        quality.add_batch_ids(np.asarray(sample["captions"]), np.asarray(ids))
        n_val += len(ids)
    if n_val == 0:  # empty validation split at tiny dataset sizes
        print("no validation batches; skipping greedy smoke")
        return state
    metrics = {k: round(v, 4) for k, v in quality.compute().items()}
    logger.log({f"val_greedy_{k}": v for k, v in metrics.items()}, step)
    print(f"greedy metrics ({n_val} val images):", metrics)
    return state


if __name__ == "__main__":
    main()

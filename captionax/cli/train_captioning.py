"""Train the non-attention hypernet captioner (the original HyperNet).

Equivalent of ``python hypernet.py`` / ``train_captioning.py``
(/root/reference/hypernet.py:26-183, train_captioning.py): a resnet
global-feature encoder with a trainable projection, a cell-level
GRU/LSTM decoder (t=0 consumes the image feature, later.py:227-490)
whose recurrent-cell weights come from the hypernet, and a **decaying
sampling probability** ``p <- p * 0.9995`` toward full teacher forcing
floor 0.25 (hypernet.py:149-150; note the reference's inverted naming).

    python -m captionax.cli.train_captioning --synthetic --cell gru
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from captionax.cli.common import (
    build_encoder,
    make_parser,
    parse_configs,
    resolve_flickr_data,
    resolve_vocab,
)
from captionax.data.loader import BatchLoader
from captionax.data.transforms import preprocess_images
from captionax.models.cell_decoders import cell_decoder_forward, cell_decoder_init
from captionax.models.encoder import resnet_apply
from captionax.models.hypernet import hypernet_apply, hypernet_init
from captionax.models.layers import embedding
from captionax.train.logging import MetricLogger
from captionax.train.losses import cross_entropy_loss
from captionax.train.state import create_train_state, get_lr, make_optimizer


def main(argv=None):
    parser = make_parser(__doc__)
    parser.add_argument("--cell", type=str, default="gru", choices=["gru", "lstm"])
    parser.add_argument("--tf-decay", type=float, default=0.9995)
    parser.add_argument("--tf-floor", type=float, default=0.25)
    parser.add_argument("--encoder-weights", type=str, default="")
    args = parser.parse_args(argv)
    model_cfg, train_cfg, data_cfg = parse_configs(args)

    vocab = resolve_vocab(data_cfg)
    V = len(vocab)
    data = resolve_flickr_data(data_cfg, vocab, train_cfg.max_len)
    E, H = model_cfg.embed_size, model_cfg.hidden_size
    print(f"cell={args.cell} vocab={V} images={len(data)}")

    key = jax.random.PRNGKey(train_cfg.seed)
    k1, k2, k3 = jax.random.split(key, 3)
    gates = 3 if args.cell == "gru" else 4
    params = {
        "proj": {  # the trainable resnet fc (hypernet.py:41-48)
            "w": jax.random.normal(k1, (2048, E)) * 0.02,
            "b": jnp.zeros((E,)),
        },
        "decoder": cell_decoder_init(k2, E, H, V, cell=args.cell),
        "hn": hypernet_init(k3, hyper_emb=E, input_dim=E, hidden_dim=H,
                            gates=gates),
    }
    encoder_params = build_encoder(model_cfg, k2, args.encoder_weights)
    encode = jax.jit(
        lambda imgs: resnet_apply(encoder_params, preprocess_images(imgs))
        .mean(axis=(1, 2))
    )

    tx = make_optimizer(train_cfg.lr, train_cfg.grad_clip)
    state = create_train_state(params, tx)
    logger = MetricLogger(train_cfg.checkpoint_dir, args.run_name)

    cell = args.cell

    def make_step(teacher_forcing: bool):
        # two separate jitted programs, selected on host per step — one
        # fused TF+no-TF loss traces 4 scans under grad and compiles
        # painfully slowly through the remote-compile service
        @jax.jit
        def train_step(state, feats2048, captions, style_id, rng):
            def loss_fn(p):
                feat = feats2048 @ p["proj"]["w"] + p["proj"]["b"]
                style_embed = embedding(p["decoder"]["embed"], style_id)
                theta = hypernet_apply(p["hn"], style_embed)
                logits = cell_decoder_forward(
                    p["decoder"], feat, captions, cell=cell,
                    teacher_forcing=teacher_forcing, rng=rng,
                    cell_params=theta,
                )
                return cross_entropy_loss(logits, captions)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            return state.apply_gradients(grads, tx), loss

        return train_step

    step_tf = make_step(True)
    step_sample = make_step(False)

    train_idx, _, _ = data.splits(seed=train_cfg.seed)
    # decaying sampling probability (reference inverted naming: this is
    # the chance of the no-TF multinomial path)
    sample_prob = 1.0
    step = 0
    import numpy as np

    rng_py = np.random.RandomState(train_cfg.seed)
    for epoch in range(train_cfg.max_epochs):
        for batch in BatchLoader(
            data.batches(train_idx, train_cfg.batch_size, style="random",
                         seed=train_cfg.seed + epoch)
        ):
            feats = encode(batch["images"])
            fn = step_tf if rng_py.rand() > sample_prob else step_sample
            state, loss = fn(
                state, feats, batch["captions"], batch["style_id"],
                jax.random.PRNGKey(step),
            )
            sample_prob = max(sample_prob * args.tf_decay, args.tf_floor)
            step += 1
            if step % train_cfg.log_every == 0:
                logger.log({"train_loss": float(loss),
                            "sample_prob": sample_prob, "epoch": epoch}, step)
        print(f"epoch {epoch} loss {float(loss):.4f} lr {get_lr(state):.2e} "
              f"p_sample {sample_prob:.3f}")
    return state


if __name__ == "__main__":
    main()

"""Train the non-attention hypernet captioner (the original HyperNet).

Equivalent of ``python hypernet.py`` / ``train_captioning.py``
(/root/reference/hypernet.py:26-183, train_captioning.py): a resnet
global-feature encoder with a trainable projection, a cell-level
GRU/LSTM decoder (t=0 consumes the image feature, later.py:227-490)
whose recurrent-cell weights — for EVERY layer when ``--num-layers``
> 1, the reference default (hypernet.py:62-92) — come from the v0
hypernet (base E->4E->8E, bucketed heads), with a **decaying
teacher-forcing probability** ``p <- p * 0.9995`` from 1.0 toward the
0.25 floor (hypernet.py:137-150): training starts fully teacher-forced
and anneals to 75% multinomial-sampled steps.

Reference quirks kept (each is the trained reference's behavior):
- ``fc_out`` is excluded from the hypernet's generated tensor set AND
  from the optimizer (hypernet.py:62-68, 116-123) — it stays frozen at
  its random init.  Deviate with ``--train-fc-out``.
- the loss is mean CE over ALL positions incl. pads — no ignore_index
  (hypernet.py:145).  Deviate with ``--masked-loss``.
- DecoderGRU draws a fresh uniform-random h0 every forward
  (later.py:393); DecoderRNN (LSTM) zero-inits (later.py:259).

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
from captionax.models.hypernet import hypernet_v0_apply, hypernet_v0_init
from captionax.models.layers import embedding
from captionax.train.logging import MetricLogger
from captionax.train.losses import cross_entropy_loss
from captionax.train.state import create_train_state, get_lr, make_optimizer


def build_capgru_model(key, E, H, V, cell="gru", num_layers=1):
    """params pytree for the non-attention hypernet captioner.  The
    decoder's own cell tensors exist but are shadowed by generated theta
    (the reference overwrites them every forward, hypernet.py:112-113)."""
    k1, k2, k3 = jax.random.split(key, 3)
    gates = 3 if cell == "gru" else 4
    return {
        "proj": {  # the trainable resnet fc (hypernet.py:44-48)
            "w": jax.random.normal(k1, (2048, E)) * 0.02,
            "b": jnp.zeros((E,)),
        },
        "decoder": cell_decoder_init(k2, E, H, V, cell=cell,
                                     num_layers=num_layers),
        "hn": hypernet_v0_init(k3, hyper_emb=E, input_dim=E, hidden_dim=H,
                               gates=gates, num_layers=num_layers),
    }


def capgru_loss(params, feats2048, captions, style_id, rng, *, cell,
                teacher_forcing, pad_id):
    """Reference training_step objective (hypernet.py:126-151) as a pure
    fn: theta = hn(embed[style]); CE of the multi-layer cell decoder."""
    feat = feats2048 @ params["proj"]["w"] + params["proj"]["b"]
    style_embed = embedding(params["decoder"]["embed"], style_id)
    thetas = hypernet_v0_apply(params["hn"], style_embed)
    logits = cell_decoder_forward(
        params["decoder"], feat, captions, cell=cell,
        teacher_forcing=teacher_forcing, rng=rng,
        cell_params=thetas, random_h0=(cell == "gru"),
    )
    return cross_entropy_loss(logits, captions, pad_id=pad_id)


def freeze_fc_out(grads):
    """Zero the fc_out grads: the reference never puts fc_out in the
    optimizer (hypernet.py:116-123), so it stays at init."""
    g = dict(grads)
    g["decoder"] = dict(grads["decoder"])
    g["decoder"]["fc_out"] = jax.tree_util.tree_map(
        jnp.zeros_like, grads["decoder"]["fc_out"]
    )
    return g


def main(argv=None):
    parser = make_parser(__doc__)
    parser.add_argument("--cell", type=str, default="gru", choices=["gru", "lstm"])
    parser.add_argument("--tf-decay", type=float, default=0.9995)
    parser.add_argument("--tf-floor", type=float, default=0.25)
    parser.add_argument("--encoder-weights", type=str, default="")
    parser.add_argument("--train-fc-out", action="store_true",
                        help="deviation: also train fc_out (the reference "
                             "freezes it at random init, hypernet.py:116-123)")
    parser.add_argument("--masked-loss", action="store_true",
                        help="deviation: ignore pad positions in the CE "
                             "(the reference passes no ignore_index)")
    args = parser.parse_args(argv)
    model_cfg, train_cfg, data_cfg = parse_configs(args)

    vocab = resolve_vocab(data_cfg)
    V = len(vocab)
    data = resolve_flickr_data(data_cfg, vocab, train_cfg.max_len)
    E, H = model_cfg.embed_size, model_cfg.hidden_size
    print(f"cell={args.cell} layers={model_cfg.num_layers} vocab={V} "
          f"images={len(data)}")

    key = jax.random.PRNGKey(train_cfg.seed)
    params = build_capgru_model(key, E, H, V, cell=args.cell,
                                num_layers=model_cfg.num_layers)
    encoder_params = build_encoder(model_cfg, jax.random.fold_in(key, 1),
                                   args.encoder_weights)
    encode = jax.jit(
        lambda imgs: resnet_apply(encoder_params, preprocess_images(imgs))
        .mean(axis=(1, 2))
    )

    tx = make_optimizer(train_cfg.lr, train_cfg.grad_clip)
    state = create_train_state(params, tx)
    logger = MetricLogger(train_cfg.checkpoint_dir, args.run_name)

    cell = args.cell
    pad_id = vocab.w2i["<pad>"] if args.masked_loss else None

    def make_step(teacher_forcing: bool):
        # two separate jitted programs, selected on host per step — one
        # fused TF+no-TF loss traces 4 scans under grad and compiles
        # painfully slowly through the remote-compile service
        @jax.jit
        def train_step(state, feats2048, captions, style_id, rng):
            loss, grads = jax.value_and_grad(capgru_loss)(
                state.params, feats2048, captions, style_id, rng,
                cell=cell, teacher_forcing=teacher_forcing, pad_id=pad_id,
            )
            if not args.train_fc_out:
                grads = freeze_fc_out(grads)
            return state.apply_gradients(grads, tx), loss

        return train_step

    step_tf = make_step(True)
    step_sample = make_step(False)

    train_idx, _, _ = data.splits(seed=train_cfg.seed)
    # teacher_forcing_proba: TF with prob p; p <- p * 0.9995 while
    # p > 0.25 (hypernet.py:137-150) — training starts fully
    # teacher-forced and anneals to 25% TF / 75% multinomial sampling
    tf_proba = 1.0
    step = 0
    import numpy as np

    rng_py = np.random.RandomState(train_cfg.seed)
    for epoch in range(train_cfg.max_epochs):
        for batch in BatchLoader(
            data.batches(train_idx, train_cfg.batch_size, style="random",
                         seed=train_cfg.seed + epoch)
        ):
            feats = encode(batch["images"])
            fn = step_tf if rng_py.binomial(1, tf_proba) else step_sample
            state, loss = fn(
                state, feats, batch["captions"], batch["style_id"],
                jax.random.PRNGKey(step),
            )
            if tf_proba > args.tf_floor:
                tf_proba *= args.tf_decay
            step += 1
            if step % train_cfg.log_every == 0:
                logger.log({"train_loss": float(loss),
                            "tf_proba": tf_proba, "epoch": epoch}, step)
        print(f"epoch {epoch} loss {float(loss):.4f} lr {get_lr(state):.2e} "
              f"p_tf {tf_proba:.3f}")
    return state


if __name__ == "__main__":
    main()

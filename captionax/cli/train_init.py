"""Hypernet distillation init: pretrain the hypernet to regress the GRU
weights of per-style-trained captioners before end-to-end training.

Equivalent of ``python train_init.py`` (/root/reference/train_init.py:
70-123): cycle styles, MSE between the hypernet's flat theta and each
style's target weight vector, until the loss threshold or max steps.

    python -m captionax.cli.train_init --synthetic --max-steps 200
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from captionax.cli.common import (
    build_captioner,
    build_hypernet_model,
    make_parser,
    parse_configs,
    resolve_vocab,
)
from captionax.models.hypernet import hypernet_apply_flat
from captionax.models.layers import embedding
from captionax.train.checkpoint import save_checkpoint


def flat_gru(params) -> jnp.ndarray:
    g = params["gru"]
    return jnp.concatenate(
        [g[k].reshape(-1) for k in ("w_ih", "w_hh", "b_ih", "b_hh")]
    )


def main(argv=None):
    parser = make_parser(__doc__)
    parser.add_argument("--max-steps", type=int, default=2000)
    parser.add_argument("--loss-threshold", type=float, default=1e-9)
    parser.add_argument("--style-checkpoints", type=str, default="",
                        help="comma-separated per-style captioner ckpt dirs "
                             "(factual,humour,romantic); random targets if empty")
    args = parser.parse_args(argv)
    model_cfg, train_cfg, data_cfg = parse_configs(args)

    vocab = resolve_vocab(data_cfg)
    model_cfg.vocab_size = len(vocab)
    key = jax.random.PRNGKey(train_cfg.seed)
    params = build_hypernet_model(model_cfg, vocab, key)

    styles = ["factual", "humour", "romantic"]
    style_ids = jnp.asarray([vocab(s) for s in styles])
    if args.style_checkpoints:
        from captionax.train.checkpoint import restore_checkpoint

        targets = []
        like = build_captioner(model_cfg, vocab, key)
        for d in args.style_checkpoints.split(","):
            targets.append(flat_gru(restore_checkpoint(d, like=like)))
    else:
        targets = [
            flat_gru(build_captioner(model_cfg, vocab, jax.random.PRNGKey(i)))
            for i in range(3)
        ]
    targets = jnp.stack(targets)

    tx = optax.adam(train_cfg.lr)
    opt_state = tx.init(params["hn"])

    @jax.jit
    def step(hn, opt_state, embed_table, style_idx):
        def loss_fn(hn):
            e = embedding(embed_table, style_ids[style_idx])
            theta = hypernet_apply_flat(hn, e)
            return jnp.mean((theta - targets[style_idx]) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(hn)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(hn, updates), opt_state, loss

    embed_table = params["decoder"]["embed"]
    hn = params["hn"]
    for i in range(args.max_steps):
        hn, opt_state, loss = step(hn, opt_state, embed_table, i % 3)
        if i % 100 == 0:
            print(f"step {i} style {styles[i % 3]} mse {float(loss):.3e}")
        if float(loss) < args.loss_threshold:
            break
    params["hn"] = hn
    save_checkpoint(train_cfg.checkpoint_dir, 0, params)
    print(f"distilled hypernet saved to {train_cfg.checkpoint_dir}, "
          f"final mse {float(loss):.3e}")
    return params


if __name__ == "__main__":
    main()

"""Validate a multi-chip sharding configuration before burning slice time.

No reference equivalent (its distributed hooks are dead code, SURVEY.md
§2.10).  This answers "will my config shard?" for the three mesh axes:

- builds the requested ``data x model`` (and optionally ``pipe``) mesh;
- jits ONE full training step of the chosen model family over it at the
  user's dims on tiny batches, asserting a finite loss;
- with ``--pipe`` (or ``--seq [--seq-ring]``), runs a pipelined (or
  sequence-sharded) LaBERT grad step and checks the loss equals the
  sequential stack's;
- prints the resulting parameter shardings.

Run it on real chips as-is, or anywhere with virtual devices:

    python -m captionax.cli.scale_check --virtual 8 --mesh-data 4 \
        --mesh-model 2 --kind hypernet
    python -m captionax.cli.scale_check --virtual 8 --pipe 4 --kind labert
"""

from __future__ import annotations

import os
import sys


def _early_env(argv):
    """--virtual N must take effect before the first jax import: force
    the CPU platform with N host devices (same mechanism as the tests
    and the driver's dryrun)."""
    if "--virtual" in argv:
        n = argv[argv.index("--virtual") + 1]
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n}"
            ).strip()
        os.environ["JAX_PLATFORMS"] = "cpu"


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    _early_env(argv)

    import argparse

    parser = argparse.ArgumentParser(
        prog="scale_check", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    parser.add_argument("--virtual", type=int, default=0,
                        help="use N virtual CPU devices instead of the "
                             "attached accelerator(s)")
    parser.add_argument("--kind", default="hypernet",
                        choices=["gru", "hypernet", "labert"])
    parser.add_argument("--mesh-data", type=int, default=0,
                        help="data-axis size (default: devices / model)")
    parser.add_argument("--mesh-model", type=int, default=1,
                        help="tensor-parallel axis size")
    parser.add_argument("--pipe", type=int, default=0,
                        help="pipeline stages (labert only; uses a "
                             "data x pipe mesh instead of data x model)")
    parser.add_argument("--seq", type=int, default=0,
                        help="sequence-parallel shards of the token axis "
                             "(labert only; data x seq mesh)")
    parser.add_argument("--seq-ring", action="store_true",
                        help="with --seq: ring-attention schedule")
    parser.add_argument("--feature-size", type=int, default=200)
    parser.add_argument("--embed-size", type=int, default=200)
    parser.add_argument("--hidden-size", type=int, default=200)
    parser.add_argument("--vocab-size", type=int, default=9684)
    parser.add_argument("--num-features", type=int, default=2048)
    parser.add_argument("--hidden", type=int, default=768,
                        help="labert hidden size")
    parser.add_argument("--bert-layers", type=int, default=12)
    parser.add_argument("--bert-heads", type=int, default=12)
    parser.add_argument("--steps", type=int, default=2)
    args = parser.parse_args(argv)

    import jax

    if args.virtual:
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
    import jax.numpy as jnp

    devs = jax.devices()
    print(f"devices: {len(devs)} x {devs[0].platform}")

    if args.kind == "labert":
        _check_labert(args, jax, jnp)
    else:
        _check_captioner(args, jax, jnp)


def _check_captioner(args, jax, jnp):
    """gru / hypernet: the flagship data x model TP/DP training step."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from captionax.models import decoder as dec
    from captionax.models.hypernet import hypernet_init
    from captionax.parallel.mesh import (
        make_mesh, replicate_params, shard_batch,
    )
    from captionax.train.state import create_train_state, make_optimizer
    from captionax.train.steps import make_gru_steps, make_hypernet_steps

    n_model = args.mesh_model
    n_data = args.mesh_data or len(jax.devices()) // n_model
    mesh = make_mesh(n_data=n_data, n_model=n_model)
    print(f"mesh: data{n_data} x model{n_model}")

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    nf, fo, e, h, v = (args.num_features, args.feature_size,
                       args.embed_size, args.hidden_size, args.vocab_size)
    decoder = dec.attention_gru_init(k1, nf, fo, e, h, v)
    # make_gru_steps trains the bare decoder pytree; the hypernet step
    # trains {"decoder", "hn"} (train/steps.py)
    if args.kind == "hypernet":
        params = {
            "decoder": decoder,
            "hn": hypernet_init(k2, hyper_emb=e, input_dim=e + fo,
                                hidden_dim=h),
        }
    else:
        params = decoder

    params = replicate_params(mesh, params)
    dec_p = params["decoder"] if args.kind == "hypernet" else params
    if n_model > 1:
        shard = lambda x, s: jax.device_put(x, NamedSharding(mesh, s))
        dec_p["fc"]["w"] = shard(dec_p["fc"]["w"], P(None, "model"))
        dec_p["fc"]["b"] = shard(dec_p["fc"]["b"], P("model"))
        dec_p["embed"] = shard(dec_p["embed"], P("model", None))
        if args.kind == "hypernet":
            for head in params["hn"]["heads"].values():
                head["l1"]["w"] = shard(head["l1"]["w"], P(None, "model"))
                head["l1"]["b"] = shard(head["l1"]["b"], P("model"))

    B, R, T = 2 * n_data, 49, 12
    kf, kc = jax.random.split(jax.random.PRNGKey(1))
    batch = {
        "features": jax.random.normal(kf, (B, R, nf), jnp.float32),
        "captions": jax.random.randint(kc, (B, T), 1, v).astype(jnp.int32),
    }
    tx = make_optimizer(1e-3)
    if args.kind == "hypernet":
        batch["style_id"] = jnp.asarray(0, jnp.int32)
        step, _ = make_hypernet_steps(tx)
    else:
        step, _ = make_gru_steps(tx)
    state = create_train_state(params, tx)
    batch = shard_batch(mesh, batch)
    pstep = jax.jit(step)
    losses = []
    for _ in range(args.steps):
        state, metrics = pstep(state, batch)
        losses.append(float(metrics["train_loss"]))
    assert all(x == x for x in losses), f"NaN loss: {losses}"
    fc_p = (state.params["decoder"] if args.kind == "hypernet"
            else state.params)
    fc = fc_p["fc"]["w"].sharding
    print(f"train loss over {args.steps} steps: "
          + " -> ".join(f"{x:.4f}" for x in losses))
    print(f"fc sharding: {getattr(fc, 'spec', fc)}")
    print("scale_check OK")


def _check_labert(args, jax, jnp):
    """labert: data x pipe pipelined grad step == sequential stack."""
    from captionax.models import labert
    from captionax.parallel.pipeline import (
        pipeline_mesh, pipelined_bert_encoder,
    )

    n_devices = len(jax.devices())
    n_pipe = args.pipe or 1
    n_seq = args.seq or 1
    if n_pipe > 1 and n_seq > 1:
        raise SystemExit("--pipe and --seq are mutually exclusive")
    if max(n_pipe, n_seq) > n_devices:
        raise SystemExit(
            f"--pipe/--seq {max(n_pipe, n_seq)} needs that many devices, "
            f"have {n_devices}"
        )
    n_data = args.mesh_data or n_devices // max(n_pipe, n_seq, 1)
    if n_pipe > 1 and args.bert_layers % n_pipe:
        raise SystemExit(f"--bert-layers {args.bert_layers} must divide "
                         f"by --pipe {n_pipe}")
    axis = f"pipe{n_pipe}" if n_pipe > 1 else f"seq{n_seq}"
    print(f"mesh: data{n_data} x {axis}")

    params = labert.labert_init(
        jax.random.PRNGKey(0), vocab_size=args.vocab_size,
        hidden=args.hidden, num_layers=args.bert_layers,
        num_heads=args.bert_heads, intermediate=4 * args.hidden,
        num_regions=4, image_dim=args.num_features,
    )
    B, R, T = 2 * n_devices, 4, 6
    T += (-(R + T)) % max(n_seq, 1)  # 4 image + T text must divide --seq
    kf, ki = jax.random.split(jax.random.PRNGKey(1))
    feats = jax.random.normal(kf, (B, R, args.num_features))
    ids = jax.random.randint(ki, (B, T), 0, args.vocab_size)
    types = jnp.zeros((B, T), jnp.int32)
    rng = jax.random.PRNGKey(2)

    enc = None
    if n_pipe > 1:
        enc = pipelined_bert_encoder(
            pipeline_mesh(n_pipe=n_pipe, n_data=n_data),
            n_micro=max(2, n_pipe), num_heads=args.bert_heads,
            data_axis="data",
        )
    elif n_seq > 1:
        from captionax.parallel.sequence import (
            sequence_mesh, sequence_parallel_bert_encoder,
        )

        enc = sequence_parallel_bert_encoder(
            sequence_mesh(n_seq=n_seq, n_data=n_data),
            num_heads=args.bert_heads, data_axis="data",
            ring=args.seq_ring,
        )

    def loss(p, encoder_fn=None):
        return labert.labert_loss(
            p, feats, ids, types, rng, mask_id=args.vocab_size - 1,
            num_heads=args.bert_heads, encoder_fn=encoder_fn)

    lp, grads = jax.jit(
        jax.value_and_grad(lambda p: loss(p, enc)))(params)
    assert float(lp) == float(lp), "NaN loss"
    finite = all(
        bool(jnp.all(jnp.isfinite(g)))
        for g in jax.tree_util.tree_leaves(grads)
    )
    assert finite, "non-finite grads"
    mode = ("pipelined" if n_pipe > 1
            else "seq-sharded" if n_seq > 1 else "sequential")
    msg = f"{mode} loss {float(lp):.4f}, grads finite"
    if enc is not None:
        ls = jax.jit(loss)(params)
        assert abs(float(lp) - float(ls)) < 1e-3, (float(lp), float(ls))
        msg += f", == sequential {float(ls):.4f}"
    print(msg)
    print("scale_check OK")


if __name__ == "__main__":
    main()

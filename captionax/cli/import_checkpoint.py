"""Import a trained reference Lightning checkpoint into captionax.

Converts a ``.ckpt`` saved by the reference trainers —
``train_attention_gru.py`` (CaptionAttentionGru), ``hypernet_attention.py``
(HyperNet) or ``cc_train_hypernet.py`` (HyperNetCC) — into a captionax
Orbax checkpoint that ``cli/evaluate`` / ``cli/caption`` / the trainers
restore directly, plus (optionally) the frozen ResNet trunk as a
torchvision-named weights file for ``--encoder-weights``.

    python -m captionax.cli.import_checkpoint --ckpt epoch=19.ckpt \
        --out ckpts/imported --encoder-out ckpts/imported_resnet.pt
    python -m captionax.cli.evaluate --checkpoint-dir ckpts/imported \
        --kind hypernet --encoder-weights ckpts/imported_resnet.pt ...

The reference's own resume path is Lightning ``load_from_checkpoint``
(/root/reference/test_hn.py:67); this is its cross-framework equivalent.
"""

from __future__ import annotations

import argparse

from captionax.models.convert import load_lightning_checkpoint


def _shape_summary(params) -> str:
    import jax

    leaves = jax.tree_util.tree_leaves(params)
    n = sum(x.size for x in leaves)
    return f"{len(leaves)} tensors / {n:,} parameters"


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True,
                   help="reference Lightning .ckpt (or raw torch.save of "
                        "a state_dict)")
    p.add_argument("--out", required=True,
                   help="captionax checkpoint directory to write (Orbax)")
    p.add_argument("--encoder-out", default="",
                   help="also save the checkpoint's frozen ResNet trunk "
                        "as a torchvision-named .pt for --encoder-weights")
    p.add_argument("--step", type=int, default=0,
                   help="step number to record in the Orbax checkpoint")
    args = p.parse_args(argv)

    imported = load_lightning_checkpoint(args.ckpt)
    kind, params = imported["kind"], imported["params"]

    from captionax.train.checkpoint import save_checkpoint

    save_checkpoint(args.out, args.step, params)
    print(f"kind: {kind}")
    if imported["hparams"]:
        keep = {k: v for k, v in imported["hparams"].items()
                if isinstance(v, (int, float, str, bool))}
        print(f"hparams: {keep}")
    print(f"params: {_shape_summary(params)} -> {args.out}")

    if args.encoder_out:
        if imported["encoder_state_dict"] is None:
            print("no image_encoder.* keys in the checkpoint; "
                  "--encoder-out skipped")
        else:
            import torch

            torch.save(
                {k: torch.from_numpy(v.copy())
                 for k, v in imported["encoder_state_dict"].items()},
                args.encoder_out,
            )
            print(f"encoder trunk -> {args.encoder_out} "
                  f"(use --encoder-weights)")

    eval_kind = "gru" if kind == "gru" else "hypernet"
    print(f"evaluate with: cli/evaluate --checkpoint-dir {args.out} "
          f"--kind {eval_kind}"
          + (f" --encoder-weights {args.encoder_out}"
             if args.encoder_out else ""))
    return imported


if __name__ == "__main__":
    main()

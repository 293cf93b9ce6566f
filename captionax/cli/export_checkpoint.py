"""Export a captionax checkpoint to the reference's Lightning layout.

The inverse of ``cli/import_checkpoint``: converts an Orbax checkpoint
written by the captionax trainers (``train_gru`` / ``train_hypernet`` /
``cc_train_hypernet``) into a ``.ckpt`` whose ``state_dict`` loads into
the reference modules (``CaptionAttentionGru``
/root/reference/train_attention_gru.py:32-52, ``HyperNet``
hypernet_attention.py:32-101, ``HyperNetCC`` cc_train_hypernet.py:42-108)
with ``strict=False`` (strict on the exported submodules; the reference
object also holds the frozen torchvision trunk — pass
``--encoder-weights`` to include it, exported with identity BatchNorm
statistics that reproduce the folded conv*scale+bias exactly).

    python -m captionax.cli.export_checkpoint --checkpoint-dir ckpts/run \
        --kind hypernet --out hypernet_captionax.ckpt \
        [--encoder-weights ckpts/imported_resnet.pt]

Round-trip guarantee (test-enforced): importing the exported file via
``cli/import_checkpoint`` reproduces the captionax params bit-exactly.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint-dir", required=True,
                   help="captionax Orbax checkpoint directory")
    p.add_argument("--kind", required=True,
                   choices=["gru", "hypernet", "hypernet_cc"])
    p.add_argument("--out", required=True,
                   help="Lightning-layout .ckpt to write")
    p.add_argument("--step", type=int, default=None,
                   help="checkpoint step to export (default: latest)")
    p.add_argument("--encoder-weights", default="",
                   help="torchvision-named ResNet .pt (e.g. from "
                        "import_checkpoint --encoder-out) to embed as "
                        "the frozen image_encoder; alternatively "
                        "--encoder-random-seed exports a fresh trunk")
    p.add_argument("--hparams", default="",
                   help="JSON dict recorded as hyper_parameters")
    args = p.parse_args(argv)

    import json

    import numpy as np
    import torch

    from captionax.models.convert import export_lightning_state_dict
    from captionax.train.checkpoint import restore_checkpoint

    params = restore_checkpoint(args.checkpoint_dir, step=args.step)
    sd = export_lightning_state_dict(args.kind, params)

    if args.encoder_weights:
        # already torchvision-named: remap into the Lightning prefix via
        # the same Sequential-index scheme the reference uses
        from captionax.models.convert import _RESNET_NAME_TO_SEQ

        prefix = ("hypernet.image_encoder.resnet."
                  if args.kind == "hypernet_cc"
                  else "image_encoder.resnet.")
        trunk = torch.load(args.encoder_weights, map_location="cpu",
                           weights_only=False)
        for name, value in trunk.items():
            mod, _, tail = name.partition(".")
            seq = _RESNET_NAME_TO_SEQ.get(mod)
            if seq is None:
                continue  # fc/avgpool etc. — EncoderCNN drops them
            sd[f"{prefix}{seq}.{tail}"] = np.asarray(
                value.numpy() if hasattr(value, "numpy") else value)

    blob = {
        "state_dict": {k: torch.from_numpy(np.ascontiguousarray(v))
                       for k, v in sd.items()},
        "hyper_parameters": json.loads(args.hparams) if args.hparams else {},
    }
    torch.save(blob, args.out)
    n = sum(v.numel() for v in blob["state_dict"].values())
    print(f"exported {args.kind}: {len(sd)} tensors / {n:,} parameters "
          f"-> {args.out}")
    print("reimport check: python -m captionax.cli.import_checkpoint "
          f"--ckpt {args.out} --out <dir>")


if __name__ == "__main__":
    main()

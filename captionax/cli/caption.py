"""Batch-caption a directory of images from a checkpoint -> JSONL.

The production counterpart of the reference's ad-hoc inference scripts
(/root/reference/visualize_flickr.py:45-115 greedy loop per image;
models/decoderlstm.py:178-184 ``infer``): native C++ image decode+resize
(csrc/imgdec.cc) -> on-device preprocess + frozen ResNet -> hypernet
theta synthesis per style -> fused Pallas beam kernel, dispatch-pipelined
(captionax/decode/serving.py) -> one JSON line per (image, style).

    python -m captionax.cli.caption --images /path/to/jpgs \\
        --checkpoint-dir ckpt --kind hypernet --styles factual,humour \\
        --out captions.jsonl
"""

from __future__ import annotations

import json
import os

import numpy as np

from captionax.cli.common import (
    build_captioner,
    build_encoder,
    build_hypernet_model,
    make_parser,
    parse_configs,
    resolve_vocab,
)


def iter_image_files(path: str):
    exts = (".jpg", ".jpeg", ".png")
    if os.path.isfile(path):
        yield path
        return
    for name in sorted(os.listdir(path)):
        if name.lower().endswith(exts):
            yield os.path.join(path, name)


def main(argv=None):
    parser = make_parser(__doc__)
    parser.add_argument("--images", type=str, required=True,
                        help="image file or directory")
    parser.add_argument("--out", type=str, default="captions.jsonl")
    parser.add_argument("--kind", type=str, default="hypernet",
                        choices=["gru", "hypernet"])
    parser.add_argument("--styles", type=str, default="factual")
    parser.add_argument("--encoder-weights", type=str, default="")
    parser.add_argument("--decode", type=str, default="beam",
                        choices=["beam", "greedy"])
    parser.add_argument("--no-fused", action="store_true",
                        help="use the scan decoders instead of the Pallas"
                             " kernels (e.g. on CPU)")
    args = parser.parse_args(argv)
    model_cfg, train_cfg, data_cfg = parse_configs(args)

    import jax

    from captionax.data.native_image import load_paths_batch
    from captionax.data.transforms import preprocess_images
    from captionax.decode.serving import (
        make_beam_server,
        make_greedy_server,
        unpack_beam_result,
    )
    from captionax.eval.metrics import ids_to_text
    from captionax.models.encoder import encoder_cnn
    from captionax.train.checkpoint import restore_checkpoint
    from captionax.train.steps import synthesize_theta

    vocab = resolve_vocab(data_cfg)
    model_cfg.vocab_size = len(vocab)
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    like = (build_captioner(model_cfg, vocab, k1) if args.kind == "gru"
            else build_hypernet_model(model_cfg, vocab, k1))
    try:
        params = restore_checkpoint(train_cfg.checkpoint_dir, like=like)
        print(f"loaded checkpoint from {train_cfg.checkpoint_dir}")
    except FileNotFoundError:
        params = like
        print("no checkpoint found; captioning with random-init weights")
    encoder_params = build_encoder(model_cfg, k2, args.encoder_weights)
    encode = jax.jit(
        lambda imgs: encoder_cnn(encoder_params, preprocess_images(imgs))
    )

    files = list(iter_image_files(args.images))
    if not files:
        raise SystemExit(f"no images found under {args.images}")
    B = train_cfg.batch_size
    styles = args.styles.split(",")
    n_out = 0
    with open(args.out, "w") as out:
        for style in styles:
            if args.kind == "hypernet":
                theta = synthesize_theta(
                    params, np.int32(vocab(style))
                )
                decoder = params["decoder"]
            else:
                theta, decoder = None, params
            # the Pallas kernels are TPU-only; fall back to the scan
            # decoders elsewhere (identical outputs,
            # tests/test_decode_kernel.py)
            use_fused = (not args.no_fused
                         and jax.devices()[0].platform == "tpu")
            if args.decode == "greedy":
                server = make_greedy_server(
                    decoder, gru_params=theta,
                    max_len=train_cfg.beam_max_steps, use_fused=use_fused,
                )
            else:
                server = make_beam_server(
                    decoder, gru_params=theta,
                    max_steps=train_cfg.beam_max_steps,
                    use_fused=use_fused, packed=True,
                )

            def feature_batches():
                for start in range(0, len(files), B):
                    chunk = files[start:start + B]
                    imgs = load_paths_batch(chunk)  # native decode+resize
                    yield encode(imgs)

            i = 0
            for result in server.map(feature_batches()):
                if args.decode == "greedy":
                    rows = [{"caption": ids_to_text(t, vocab)}
                            for t in np.asarray(result)]
                else:
                    res = unpack_beam_result(result)
                    rows = [
                        {"caption": ids_to_text(res.tokens[j], vocab),
                         "score": float(res.scores[j]),
                         "completed": bool(res.found[j])}
                        for j in range(res.tokens.shape[0])
                    ]
                for row in rows:
                    out.write(json.dumps({
                        "image": os.path.basename(files[i]),
                        "style": style, **row,
                    }) + "\n")
                    i += 1
                    n_out += 1
    print(f"wrote {n_out} captions for {len(files)} images "
          f"x {len(styles)} styles -> {args.out}")
    return n_out


if __name__ == "__main__":
    main()

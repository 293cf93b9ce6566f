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


def _result_rows(result, decode: str, vocab):
    """Device result -> JSON-ready rows (shared by the per-style and
    mixed-request paths)."""
    from captionax.decode.serving import unpack_beam_result
    from captionax.eval.metrics import ids_to_text

    if decode == "greedy":
        return [{"caption": ids_to_text(t, vocab)} for t in np.asarray(result)]
    res = unpack_beam_result(np.asarray(result))
    return [
        {"caption": ids_to_text(res.tokens[j], vocab),
         "score": float(res.scores[j]),
         "completed": bool(res.found[j])}
        for j in range(res.tokens.shape[0])
    ]


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
    parser.add_argument("--requests", type=str, default="",
                        help="JSONL of {'image': name, 'style': s} request "
                             "rows — serves arbitrary per-image styles in "
                             "ONE mixed-style stream (theta bank + "
                             "style_rows) instead of one pass per style")
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
    from captionax.decode.serving import PipelinedDecoder
    from captionax.models.encoder import encoder_cnn
    from captionax.train.checkpoint import restore_checkpoint
    from captionax.train.steps import resolve_style_id, synthesize_theta

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
    B = min(train_cfg.batch_size, len(files))
    styles = args.styles.split(",")
    # the Pallas kernels are TPU-only; fall back to the scan decoders on
    # CPU (identical outputs, tests/test_decode_kernel.py).  Under the
    # axon relay the device platform is "axon", so test for cpu, not tpu.
    use_fused = (not args.no_fused
                 and jax.devices()[0].platform != "cpu")
    decoder = params["decoder"] if args.kind == "hypernet" else params

    if args.requests:
        return _serve_requests(args, train_cfg, params, decoder, vocab,
                               encode, use_fused)

    # ONE jitted decode with theta as a traced argument: all styles and
    # all (padded) chunks share a single remote compile (~30 s-10 min
    # each through the relay, CLAUDE.md)
    if args.decode == "greedy":
        if use_fused:
            from captionax.ops.decode_kernel import fused_greedy as _g

            dec_fn = lambda th, f: _g(decoder, f, gru_params=th,  # noqa: E731
                                      max_len=train_cfg.beam_max_steps)
        else:
            from captionax.decode.search import greedy as _g

            dec_fn = lambda th, f: _g(decoder, f, gru_params=th,  # noqa: E731
                                      max_len=train_cfg.beam_max_steps)
    else:
        from captionax.decode.serving import pack_beam_result

        if use_fused:
            from captionax.ops.decode_kernel import fused_beam_search as _b
        else:
            from captionax.decode.search import beam_search as _b

        dec_fn = lambda th, f: pack_beam_result(  # noqa: E731
            _b(decoder, f, gru_params=th,
               max_steps=train_cfg.beam_max_steps)
        )
    jitted = jax.jit(dec_fn)

    n_out = 0
    with open(args.out, "w") as out:
        for style in styles:
            theta = (synthesize_theta(
                params, np.int32(resolve_style_id(params, vocab, style)))
                     if args.kind == "hypernet" else None)
            server = PipelinedDecoder(lambda f, th=theta: jitted(th, f))

            def feature_batches():
                for start in range(0, len(files), B):
                    chunk = files[start:start + B]
                    imgs = load_paths_batch(chunk)  # native decode+resize
                    if len(chunk) < B:  # pad to one compiled shape
                        imgs = np.concatenate(
                            [imgs, np.zeros((B - len(chunk),) + imgs.shape[1:],
                                            np.uint8)]
                        )
                    yield encode(imgs)

            i = 0
            for result in server.map(feature_batches()):
                for row in _result_rows(result, args.decode, vocab):
                    if i >= len(files):  # padding rows of the last chunk
                        break
                    out.write(json.dumps({
                        "image": os.path.basename(files[i]),
                        "style": style, **row,
                    }) + "\n")
                    i += 1
                    n_out += 1
    print(f"wrote {n_out} captions for {len(files)} images "
          f"x {len(styles)} styles -> {args.out}")
    return n_out


def _serve_requests(args, train_cfg, params, decoder, vocab, encode,
                    use_fused):
    """Mixed-style request serving: JSONL rows {'image', 'style'} decode
    in ONE stream — the theta bank (synthesized in its OWN dispatch, see
    captionax/decode/serving.py) stays VMEM-resident and each row picks
    its style, where the reference could only run one style per batch
    (data_loader.py:287-298)."""
    import jax
    import jax.numpy as jnp

    from captionax.data.native_image import load_paths_batch
    from captionax.decode.serving import PipelinedDecoder, pack_beam_result
    from captionax.train.steps import (
        resolve_style_id,
        style_table,
        synthesize_theta_batched,
    )

    if args.kind != "hypernet":
        raise SystemExit("--requests needs --kind hypernet "
                         "(per-request styles come from the hypernet)")
    with open(args.requests) as f:
        reqs = [json.loads(line) for line in f if line.strip()]
    if not reqs:
        raise SystemExit(f"no request rows in {args.requests}")
    styles = sorted({r["style"] for r in reqs})
    sid = {s: i for i, s in enumerate(styles)}
    base = args.images if os.path.isdir(args.images) else \
        os.path.dirname(args.images)

    def path_of(name):
        return name if os.path.isabs(name) else os.path.join(base, name)

    style_ids = jnp.asarray(
        [resolve_style_id(params, vocab, s) for s in styles], jnp.int32
    )
    bank = synthesize_theta_batched(params, style_table(params)[style_ids])

    B = min(train_cfg.batch_size, len(reqs))
    if args.decode == "greedy":
        if use_fused:
            from captionax.ops.decode_kernel import fused_greedy as _g

            def dfn(f, rows):
                return _g(decoder, f, gru_params=bank,
                          max_len=train_cfg.beam_max_steps, style_rows=rows)
        else:
            from captionax.decode.search import greedy as _g

            def dfn(f, rows):
                theta = jax.tree_util.tree_map(lambda t: t[rows], bank)
                return _g(decoder, f, gru_params=theta,
                          max_len=train_cfg.beam_max_steps)
    else:
        if use_fused:
            from captionax.ops.decode_kernel import fused_beam_search as _b

            def dfn(f, rows):
                return pack_beam_result(_b(
                    decoder, f, gru_params=bank,
                    max_steps=train_cfg.beam_max_steps, style_rows=rows,
                ))
        else:
            from captionax.decode.search import beam_search as _b

            def dfn(f, rows):
                theta = jax.tree_util.tree_map(lambda t: t[rows], bank)
                return pack_beam_result(_b(
                    decoder, f, gru_params=theta,
                    max_steps=train_cfg.beam_max_steps,
                ))

    server = PipelinedDecoder(jax.jit(dfn))

    def batches():
        for start in range(0, len(reqs), B):
            chunk = reqs[start:start + B]
            imgs = load_paths_batch([path_of(r["image"]) for r in chunk])
            rows = np.asarray([sid[r["style"]] for r in chunk], np.int32)
            if len(chunk) < B:  # pad to one compiled shape
                pad = B - len(chunk)
                imgs = np.concatenate(
                    [imgs, np.zeros((pad,) + imgs.shape[1:], np.uint8)]
                )
                rows = np.concatenate([rows, np.zeros((pad,), np.int32)])
            yield encode(imgs), jnp.asarray(rows)

    n_out = 0
    with open(args.out, "w") as out:
        i = 0
        for result in server.map(batches()):
            for row in _result_rows(result, args.decode, vocab):
                if i >= len(reqs):  # padding rows of the last chunk
                    break
                out.write(json.dumps({
                    "image": os.path.basename(reqs[i]["image"]),
                    "style": reqs[i]["style"], **row,
                }) + "\n")
                i += 1
                n_out += 1
    print(f"wrote {n_out} captions for {len(reqs)} mixed-style requests "
          f"({len(styles)} styles in one stream) -> {args.out}")
    return n_out


if __name__ == "__main__":
    main()

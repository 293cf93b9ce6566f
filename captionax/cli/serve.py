"""Serve styled captions over HTTP from a checkpoint.

The reference ships no server (inference = ad-hoc per-image loops,
/root/reference/visualize_flickr.py:45-115); this is the deployment
surface the framework adds on top of the measured relay cost model:
every concurrent request coalesces through one MicroBatcher into
fixed-shape image->encoder->fused-beam dispatches
(captionax/decode/service.py).

    python -m captionax.cli.serve --checkpoint-dir ckpt \\
        --kind hypernet --styles factual,humour,romantic --port 8080

    curl -X POST --data-binary @dog.jpg -H 'Content-Type: image/jpeg' \\
        'http://localhost:8080/caption?style=humour'
"""

from __future__ import annotations

from captionax.cli.common import (
    build_captioner,
    build_encoder,
    build_hypernet_model,
    make_parser,
    parse_configs,
    resolve_vocab,
)


def build_service(args):
    """Construct the CaptionService from CLI args (shared with tests)."""
    import jax

    from captionax.decode.service import CaptionService
    from captionax.train.checkpoint import restore_checkpoint

    model_cfg, train_cfg, data_cfg = parse_configs(args)
    vocab = resolve_vocab(data_cfg)
    model_cfg.vocab_size = len(vocab)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    like = (build_captioner(model_cfg, vocab, k1) if args.kind == "gru"
            else build_hypernet_model(model_cfg, vocab, k1))
    try:
        params = restore_checkpoint(train_cfg.checkpoint_dir, like=like)
        print(f"loaded checkpoint from {train_cfg.checkpoint_dir}")
    except FileNotFoundError:
        params = like
        print("no checkpoint found; serving random-init weights")
    encoder_params = build_encoder(model_cfg, k2, args.encoder_weights)
    use_fused = None if not args.no_fused else False
    mesh = None
    if getattr(args, "mesh_data", 0):
        from captionax.parallel.mesh import make_mesh

        mesh = make_mesh(n_data=args.mesh_data)
        use_fused = False  # jit/GSPMD route; see service.py mesh note
    return CaptionService(
        params, encoder_params, vocab,
        styles=args.styles.split(","),
        batch_size=args.window,
        max_steps=train_cfg.beam_max_steps,
        use_fused=use_fused,
        decode=args.decode,
        mesh=mesh,
        int8_encoder=args.int8_encoder,
    )


def make_serve_parser(doc=None):
    """The full serve flag surface — single source of truth (tests build
    their service args from this too, so new flags can't drift)."""
    parser = make_parser(doc or __doc__)
    parser.add_argument("--kind", type=str, default="hypernet",
                        choices=["gru", "hypernet"])
    parser.add_argument("--styles", type=str, default="factual")
    parser.add_argument("--encoder-weights", type=str, default="")
    parser.add_argument("--decode", type=str, default="beam",
                        choices=["beam", "greedy"])
    parser.add_argument("--no-fused", action="store_true")
    parser.add_argument("--int8-encoder", action="store_true",
                        help="serve with the calibrated int8 encoder: 4x "
                             "smaller encoder params, +6.5%% bulk "
                             "throughput, captions identical to bf16 on "
                             "the measured eval batch (BASELINE.md; "
                             "models/encoder.py resnet_quantize)")
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--window", type=int, default=64,
                        help="MicroBatcher compiled batch (the coalescing "
                             "window; requests/dispatch ceiling)")
    parser.add_argument("--rss-limit-mb", type=float, default=0.0,
                        help="supervise the server in a worker subprocess "
                             "and roll it (hitless shared-listener "
                             "handover: one kernel accept queue across "
                             "worker generations) when its RSS crosses "
                             "this bound — required ops guard under the "
                             "axon relay's transfer leak "
                             "(decode/supervise.py; 0 = off)")
    parser.add_argument("--prearm-frac", type=float, default=0.8,
                        help="spawn the replacement worker at this "
                             "fraction of --rss-limit-mb so the switch at "
                             "the limit is immediate (bounds the RSS "
                             "overshoot to ~one poll interval of leak)")
    parser.add_argument("--drain-grace", type=float, default=10.0,
                        help="seconds a retiring worker keeps running its "
                             "in-flight handler threads after SIGTERM")
    parser.add_argument("--_worker", action="store_true",
                        help=__import__("argparse").SUPPRESS)
    parser.add_argument("--listen-fd", type=int, default=-1,
                        help=__import__("argparse").SUPPRESS)
    parser.add_argument("--standby", action="store_true",
                        help=__import__("argparse").SUPPRESS)
    # --mesh-data comes from make_parser; here it shards each inference
    # dispatch over the data axis (service.py mesh note)
    return parser


def _warmup(service):
    """Pay the compile before the listener opens (the replacement worker
    must be hot when it takes traffic; the on-disk compile cache makes
    this seconds, not minutes, after the first worker)."""
    import numpy as np

    service.caption_array(
        np.zeros((service.image_size, service.image_size, 3), np.uint8),
        service.styles[0],
    )


def main(argv=None):
    import sys

    args = make_serve_parser().parse_args(argv)

    if args.rss_limit_mb > 0 and not getattr(args, "_worker", False):
        # SUPERVISOR: run the actual server in a recyclable subprocess
        from captionax.decode.supervise import RssSupervisor

        if args.port == 0:
            raise SystemExit("--rss-limit-mb needs a fixed --port "
                             "(the supervisor binds it once and workers "
                             "inherit the listening fd)")
        base = list(argv) if argv is not None else sys.argv[1:]
        sup = RssSupervisor(
            [sys.executable, "-m", "captionax.cli.serve", *base, "--_worker"],
            args.rss_limit_mb,
            listen_host=args.host, listen_port=args.port,
            prearm_frac=args.prearm_frac,
        )
        print(f"supervising serve workers on :{args.port} "
              f"(rss limit {args.rss_limit_mb:.0f} MB)", flush=True)
        sup.run()
        return

    if getattr(args, "_worker", False):
        from captionax.decode.supervise import run_worker

        service = build_service(args)
        run_worker(service, args.host, args.port,
                   drain_grace_s=args.drain_grace, warmup=_warmup,
                   listen_fd=args.listen_fd if args.listen_fd >= 0 else None,
                   standby=args.standby)
        return

    from captionax.decode.service import make_http_server

    with build_service(args) as service:
        srv = make_http_server(service, args.host, args.port)
        host, port = srv.server_address[:2]
        print(f"serving {service.styles} on http://{host}:{port} "
              f"(POST /caption, GET /healthz)", flush=True)
        try:
            srv.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            srv.shutdown()


if __name__ == "__main__":
    main()

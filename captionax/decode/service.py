"""Online caption service: HTTP requests -> coalesced TPU dispatches.

The reference has no serving story — inference is ad-hoc scripts that
loop one image at a time (/root/reference/visualize_flickr.py:45-115).
This module is the production counterpart built on the measured relay
cost model (BASELINE.md): a dedicated dispatch per request pays the
~28 ms floor serially, so the service funnels every concurrent request
through one :class:`captionax.decode.serving.MicroBatcher` — arrivals
during the in-flight window coalesce into the next fixed-shape batch
and the floor amortizes across whoever is waiting (measured 6-8x
sustainable throughput in ``benchmarks/latency_packing.py``).

Requests carry IMAGE BYTES (the production interface — and also the
smallest payload: 147 KB uint8 vs 392 KB f32 features through the
~30 MB/s relay).  Each dispatch runs native decode on the host thread,
then preprocess + frozen encoder + mixed-style fused beam on-device in
ONE program, with the hypernet theta bank synthesized eagerly at build
time (its own dispatch — relay AOT rule, benchmarks/README.md) and each
request row picking its style via ``style_rows``.
"""

from __future__ import annotations

import json
import threading
from typing import Optional, Sequence

import numpy as np

from captionax.decode.serving import MicroBatcher, unpack_beam_result


class CaptionService:
    """Thread-safe styled-captioning service over one device.

    ``params`` is a hypernet model pytree (``{"decoder", "hn", ...}``)
    or a plain attention-GRU decoder pytree; ``styles`` names the rows
    of the theta bank (hypernet only — a plain GRU serves its single
    trained style under whatever name is passed first).
    """

    def __init__(
        self,
        params,
        encoder_params,
        vocab,
        styles: Sequence[str] = ("factual",),
        *,
        batch_size: int = 64,
        max_steps: int = 50,
        image_size: int = 224,
        use_fused: Optional[bool] = None,
        decode: str = "beam",
        mesh=None,
        int8_encoder: bool = False,
        int8_calibration=None,
    ):
        import jax
        import jax.numpy as jnp

        from captionax.data.transforms import preprocess_images
        from captionax.models.encoder import (
            encoder_cnn,
            encoder_cnn_int8,
            resnet_quantize,
        )

        if decode not in ("beam", "greedy"):
            raise ValueError(f"decode must be beam|greedy, got {decode!r}")
        self.vocab = vocab
        self.styles = list(styles)
        self.decode = decode
        self.image_size = image_size
        self._sid = {s: i for i, s in enumerate(self.styles)}
        if use_fused is None:  # axon platform is the TPU (CLAUDE.md)
            use_fused = jax.devices()[0].platform != "cpu"

        hyper = isinstance(params, dict) and "hn" in params
        decoder = params["decoder"] if hyper else params
        if hyper:
            from captionax.train.steps import (
                resolve_style_id,
                style_table,
                synthesize_theta_batched,
            )

            ids = jnp.asarray(
                [resolve_style_id(params, vocab, s) for s in self.styles],
                jnp.int32,
            )
            # eager bank synthesis: one dispatch per service build, never
            # fused with the Pallas kernel (relay AOT limit)
            bank = jax.jit(synthesize_theta_batched)(
                params, style_table(params)[ids]
            )
        else:
            bank = None

        if use_fused:
            from captionax.ops.decode_kernel import (
                fused_beam_search,
                fused_greedy,
            )
        else:
            from captionax.decode.search import beam_search, greedy

        def _decode_tokens(dp, th, feats, rows):
            if bank is not None and not use_fused:
                # scan decoders take per-row theta, not a bank
                th = jax.tree_util.tree_map(lambda t: t[rows], th)
            kw = {"gru_params": th}
            if bank is not None and use_fused:
                kw["style_rows"] = rows
            if decode == "greedy":
                fn = fused_greedy if use_fused else greedy
                return fn(dp, feats, max_len=max_steps, **kw)
            fn = fused_beam_search if use_fused else beam_search
            res = fn(dp, feats, max_steps=max_steps, **kw)
            from captionax.decode.serving import pack_beam_result

            return pack_beam_result(res)

        if int8_encoder:
            # quantized serving: frozen encoder weights -> per-channel
            # int8, int32 MXU accumulation, with STATIC activation
            # scales calibrated here on a preprocessed random-pixel
            # batch (static scales keep the quant chain elementwise so
            # it fuses into the conv epilogues; dynamic scales measure
            # slower than bf16 — models/encoder.py resnet_quantize.
            # Caption-token agreement vs bf16 is measured on-chip by
            # benchmarks/bulk_caption.py --int8.)
            from captionax.models.encoder import resnet_calibrate

            calib = int8_calibration
            if calib is None:
                calib = np.random.RandomState(0).randint(
                    0, 256, (8, image_size, image_size, 3), dtype=np.uint8
                )
            scales = jax.jit(
                lambda ep, im: resnet_calibrate(ep, preprocess_images(im))
            )(encoder_params, jnp.asarray(calib, jnp.uint8))
            # 1.5x margin: pass real images via int8_calibration= to
            # tighten; activations past the calibrated max clip
            scales = jax.tree_util.tree_map(lambda s: s * 1.5, scales)
            encoder_params = resnet_quantize(encoder_params,
                                             act_scales=scales)
        encode = encoder_cnn_int8 if int8_encoder else encoder_cnn

        def _dispatch_fn(ep, dp, th, imgs, rows):
            feats = encode(ep, preprocess_images(imgs))
            return _decode_tokens(dp, th, feats, rows)

        if mesh is None:
            _dispatch = jax.jit(_dispatch_fn)
            put = jax.device_put
        else:
            # multi-chip serving: batch sharded over the mesh's "data"
            # axis, weights replicated; GSPMD partitions the whole
            # image->encoder->beam program (batch_size must divide by
            # the data-axis size).  The fused kernel additionally has a
            # shard_map route (serving.make_sharded_beam_decode, used by
            # dryrun_multichip); this jit route covers the scan decoders
            # on any backend.
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_data = mesh.shape["data"]
            if batch_size % n_data:
                raise ValueError(
                    f"batch_size {batch_size} must divide by the mesh "
                    f"data axis ({n_data})"
                )
            repl = NamedSharding(mesh, P())
            bsh = NamedSharding(mesh, P("data"))
            _dispatch = jax.jit(
                _dispatch_fn,
                in_shardings=(repl, repl, repl, bsh, bsh),
                out_shardings=bsh,
            )
            put = lambda t: jax.device_put(t, repl)  # noqa: E731

        # device-resident weights passed as ARGUMENTS (closed-over
        # constants inflate the relay compile payload -> HTTP 413)
        ep = put(encoder_params)
        dp = put(decoder)
        th = put(bank) if bank is not None else None
        self._batcher = MicroBatcher(
            lambda imgs, rows: _dispatch(ep, dp, th, imgs, rows),
            batch_size=batch_size,
            feature_shape=(image_size, image_size, 3),
            styled=True,
            feature_dtype=np.uint8,
        )

        self._stats_lock = threading.Lock()
        self._lat_ms: list = []  # ring buffer of recent request latencies
        self._served = 0
        self._errors = 0

    def _record(self, dt_ms: float, error: bool = False):
        with self._stats_lock:
            if error:
                self._errors += 1
            else:
                self._served += 1
                self._lat_ms.append(dt_ms)
                if len(self._lat_ms) > 4096:
                    del self._lat_ms[:2048]

    def stats(self) -> dict:
        """Served/error counts + recent latency percentiles (ms) + host
        RSS (ops visibility: through the axon relay image every
        host->device transfer's bytes leak in the PJRT plugin —
        measured 1:1 in benchmarks/serving_soak.py; stock JAX is flat —
        so RSS here is the signal for when a relay-attached worker
        needs recycling)."""
        with self._stats_lock:
            lat = np.asarray(self._lat_ms, np.float64)
            out = {"served": self._served, "errors": self._errors,
                   "styles": self.styles, "decode": self.decode}
        try:
            with open("/proc/self/status") as f:
                for line in f:
                    if line.startswith("VmRSS:"):
                        out["rss_mb"] = round(int(line.split()[1]) / 1024, 1)
                        break
        except OSError:
            pass
        if lat.size:
            out["p50_ms"] = round(float(np.percentile(lat, 50)), 2)
            out["p95_ms"] = round(float(np.percentile(lat, 95)), 2)
        return out

    # -- request paths ----------------------------------------------------

    def submit_array(self, img: np.ndarray, style: str):
        """uint8 [H, W, 3] (already image_size x image_size) -> Future."""
        if style not in self._sid:
            raise KeyError(
                f"unknown style {style!r}; serving {self.styles}"
            )
        want = (self.image_size, self.image_size, 3)
        if tuple(np.shape(img)) != want:
            raise ValueError(
                f"image must be shape {want}, got {np.shape(img)} "
                "(use caption_bytes for undecoded/unresized inputs)"
            )
        return self._batcher.submit(img, self._sid[style])

    def caption_array(self, img: np.ndarray, style: str) -> dict:
        import time

        from captionax.eval.metrics import ids_to_text

        t0 = time.perf_counter()
        try:
            out = self.submit_array(img, style).result()
        except Exception:
            self._record(0.0, error=True)
            raise
        self._record((time.perf_counter() - t0) * 1e3)
        if self.decode == "greedy":
            return {"caption": ids_to_text(out, self.vocab), "style": style}
        res = unpack_beam_result(out[None])
        return {
            "caption": ids_to_text(res.tokens[0], self.vocab),
            "score": float(res.scores[0]),
            "completed": bool(res.found[0]),
            "style": style,
        }

    def caption_bytes(self, data: bytes, style: str) -> dict:
        """Encoded JPEG/PNG bytes -> caption dict (native C++ decode)."""
        from captionax.data.native_image import decode_resize

        img = decode_resize(data, (self.image_size, self.image_size))
        return self.caption_array(img, style)

    def close(self):
        self._batcher.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def make_http_server(service: CaptionService, host: str = "127.0.0.1",
                     port: int = 0, reuse_port: bool = False,
                     listen_fd: Optional[int] = None):
    """Build a ``ThreadingHTTPServer`` front-end for ``service``.

    ``listen_fd`` adopts an ALREADY bound+listening socket inherited
    from a supervisor (captionax.decode.supervise) instead of binding:
    every worker generation then accepts from the SAME kernel accept
    queue, so a retiring worker that simply stops accepting strands no
    queued connections — the truly hitless rolling-restart handover
    (SO_REUSEPORT, by contrast, gives each process its own accept queue
    and Linux RSTs whatever sits in a queue when its socket closes —
    the 2 drain-moment errors of the r4 guarded soak).

    Endpoints:

    - ``GET /healthz`` -> ``{"status": "ok", "styles": [...]}``
    - ``GET /stats``   -> served/error counts + recent p50/p95 ms
    - ``POST /caption`` with an ``image/jpeg`` / ``image/png`` body
      (style via ``?style=...``), or an ``application/json`` body
      ``{"image_b64": ..., "style": ...}``.

    Returns the server object; call ``serve_forever()`` (or run it on a
    thread) and ``shutdown()`` to stop.  Threading matters: concurrent
    handler threads block in ``caption_bytes`` and the MicroBatcher
    coalesces them into shared dispatches.
    """
    import base64
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    class Server(ThreadingHTTPServer):
        # stdlib default backlog is 5: bursts of >5 concurrent connects
        # get RSTs before a handler thread ever runs (measured at 32
        # clients in benchmarks/serving_http.py)
        request_queue_size = 128
        daemon_threads = True

        def server_bind(self):
            # SO_REUSEPORT lets a replacement worker bind the same port
            # while this one drains — the rolling-restart handover
            # (captionax.decode.supervise; the relay plugin's RSS leak
            # makes recycling an operational requirement in this image)
            if reuse_port:
                import socket

                self.socket.setsockopt(socket.SOL_SOCKET,
                                       socket.SO_REUSEPORT, 1)
            super().server_bind()

    class Handler(BaseHTTPRequestHandler):
        def _json(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet by default
            pass

        def do_GET(self):
            path = urlparse(self.path).path
            if path == "/healthz":
                self._json(200, {"status": "ok",
                                 "styles": service.styles,
                                 "decode": service.decode})
            elif path == "/stats":
                self._json(200, service.stats())
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            url = urlparse(self.path)
            if url.path != "/caption":
                self._json(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                raw = self.rfile.read(n)
                ctype = self.headers.get("Content-Type", "")
                if ctype.startswith("application/json"):
                    req = json.loads(raw)
                    data = base64.b64decode(req["image_b64"])
                    style = req.get("style", service.styles[0])
                else:
                    data = raw
                    q = parse_qs(url.query)
                    style = q.get("style", [service.styles[0]])[0]
                self._json(200, service.caption_bytes(data, style))
            except KeyError as e:
                self._json(400, {"error": str(e)})
            except Exception as e:  # undecodable image, bad json, ...
                self._json(400, {"error": f"{type(e).__name__}: {e}"})

    if listen_fd is not None:
        import socket

        srv = Server((host, port), Handler, bind_and_activate=False)
        srv.socket.close()  # discard the unbound ctor socket
        srv.socket = socket.socket(fileno=listen_fd)
        srv.server_address = srv.socket.getsockname()
        return srv
    return Server((host, port), Handler)


def serve_background(service: CaptionService, host: str = "127.0.0.1",
                     port: int = 0):
    """Start the HTTP server on a daemon thread; returns (server, port)."""
    srv = make_http_server(service, host, port)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, srv.server_address[1]

"""Full-stack HTTP serving benchmark on the real chip at production dims.

Measures what a deployed captioner actually delivers: concurrent HTTP
clients POST a real JPEG (the production payload — ~smallest bytes
through the ~30 MB/s relay) to ``cli/serve``'s endpoint; the service
coalesces arrivals through the MicroBatcher into mixed-style
image->preprocess->ResNet-152->fused-beam dispatches.

Closed-loop load for C in {1, 8, 32} clients: per-request p50/p95 and
sustained requests/s, through the whole stack (TCP + HTTP + native
decode + relay + device).  Compare against ``latency_packing.py``'s
library-level rows to see what the HTTP layer costs.

    nohup python benchmarks/serving_http.py > /tmp/serving_http.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NF, R = 2048, 49
FO = E = H = 200
V = 9684


def build_service(window: int, max_steps: int, styles, use_fused=None):
    from captionax.core.runtime import setup_runtime

    setup_runtime()
    import jax

    from captionax.core.vocab import load_vocab_pickle
    from captionax.decode.service import CaptionService
    from captionax.models import decoder as dec
    from captionax.models.encoder import resnet_init
    from captionax.models.hypernet import hypernet_init

    vocab = load_vocab_pickle("/root/reference/data/vocab.pkl")
    assert len(vocab) == V
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "decoder": dec.attention_gru_init(k1, NF, FO, E, H, V),
        "hn": hypernet_init(k2, hyper_emb=E, input_dim=E + FO, hidden_dim=H),
    }
    # nudge </s> so captions terminate like a trained model's (~10-25
    # steps) — the realistic serving regime for the early-exit kernel
    params["decoder"]["fc"]["b"] = (
        params["decoder"]["fc"]["b"].at[2].add(1.2)
    )
    encoder_params = resnet_init(k3, depth=152)
    return CaptionService(
        params, encoder_params, vocab, styles=styles,
        batch_size=window, max_steps=max_steps, use_fused=use_fused,
    )


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--window", type=int, default=32)
    p.add_argument("--max-steps", type=int, default=50)
    p.add_argument("--requests", type=int, default=192)
    p.add_argument("--styles", type=str, default="factual,humour,romantic")
    p.add_argument("--no-fused", action="store_true")
    p.add_argument("--out", type=str,
                   default=os.path.join(os.path.dirname(__file__),
                                        "_parity", "serving_http.json"))
    args = p.parse_args(argv)

    styles = args.styles.split(",")
    jpeg = open(os.path.join(os.path.dirname(__file__), os.pardir, "tests",
                             "fixtures", "images", "photo_gradient.jpg"),
                "rb").read()

    service = build_service(args.window, args.max_steps, styles,
                            use_fused=False if args.no_fused else None)
    from captionax.decode.service import serve_background

    srv, port = serve_background(service)
    print(f"serving on :{port}; warming compile...", flush=True)

    def post(style):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/caption?style={style}",
            data=jpeg, headers={"Content-Type": "image/jpeg"},
        )
        with urllib.request.urlopen(req, timeout=1200) as r:
            return json.loads(r.read())

    t0 = time.time()
    out = post(styles[0])  # compile (relay: 30 s - 10 min) + warm
    print(f"first request (compile) {time.time() - t0:.1f} s: {out}",
          flush=True)

    rows = []
    for clients in (1, 8, 32, 64):
        n = args.requests if clients > 1 else args.requests // 4
        lats, errs = [], []
        lock = threading.Lock()

        def client(n_req, ci):
            for j in range(n_req):
                style = styles[(ci + j) % len(styles)]  # mixed styles
                t = time.time()
                try:
                    post(style)
                except Exception as e:  # pragma: no cover
                    with lock:
                        errs.append(repr(e))
                    continue
                dt = (time.time() - t) * 1e3
                with lock:
                    lats.append(dt)

        t0 = time.time()
        threads = [threading.Thread(target=client, args=(n // clients, ci))
                   for ci in range(clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        secs = time.time() - t0
        lat = np.asarray(lats)
        row = {
            "mode": f"http_c{clients}",
            "clients": clients,
            "requests": len(lats),
            "errors": len(errs),
            "p50_ms": round(float(np.percentile(lat, 50)), 2),
            "p95_ms": round(float(np.percentile(lat, 95)), 2),
            "throughput_rps": round(len(lats) / secs, 1),
            "compiled_batch": args.window,
            "styles": len(styles),
        }
        print(json.dumps(row), flush=True)
        rows.append(row)
        if errs:
            print("errors:", errs[:3], flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {args.out}", flush=True)
    srv.shutdown()
    service.close()


if __name__ == "__main__":
    main()

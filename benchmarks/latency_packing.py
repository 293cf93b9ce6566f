"""Single-request latency under the relay dispatch floor: can packing help?

Round-1 finding (BASELINE.md): a B=1 beam decode costs ~27 ms end-to-end
— the ~28 ms axon-relay dispatch floor, not compute.  VERDICT r1 asked
whether multi-request packing within one dispatch window can serve
1-at-a-time arrivals better than a dedicated dispatch per request.

Measures, on the real chip at production dims (V=9684, nf=2048,
dims 200, fused beam kernel, 50-step horizon, packed single-buffer
fetch):

1. ``sequential`` — a dedicated B=1 dispatch per request (the naive
   floor): p50/p95 per-request latency + throughput.
2. ``packed``     — :class:`captionax.decode.serving.MicroBatcher` with a
   fixed compiled batch of ``--batch-size``: closed-loop load from C
   concurrent clients for C in {1, 4, 16, 64}.  Arrivals during the
   in-flight window coalesce into the next dispatch, so the floor
   amortizes across whoever is waiting.

Prints one JSON line per row; BASELINE.md records the table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NF, R = 2048, 49
FO = E = H = 200
V = 9684


def build(batch_size: int, max_steps: int):
    from captionax.core.runtime import setup_runtime

    setup_runtime()
    import jax

    from captionax.decode.serving import pack_beam_result
    from captionax.models import decoder as dec
    from captionax.models.hypernet import hypernet_init
    from captionax.ops.decode_kernel import fused_beam_search
    from captionax.train.steps import synthesize_theta

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {
        "decoder": dec.attention_gru_init(k1, NF, FO, E, H, V),
        "hn": hypernet_init(k2, hyper_emb=E, input_dim=E + FO,
                            hidden_dim=H),
    }
    theta = jax.jit(synthesize_theta)(params, np.int32(4))
    theta = jax.tree_util.tree_map(lambda x: np.asarray(x), theta)

    def decode(f):
        return pack_beam_result(fused_beam_search(
            params["decoder"], f, gru_params=theta, max_steps=max_steps,
        ))

    fn = jax.jit(decode)
    # warm both compiled shapes
    feats1 = np.random.default_rng(0).normal(
        size=(1, R, NF)).astype(np.float32)
    featsB = np.random.default_rng(0).normal(
        size=(batch_size, R, NF)).astype(np.float32)
    fn1 = jax.jit(decode)
    np.asarray(fn1(feats1))
    np.asarray(fn(featsB))
    return fn1, fn, feats1


def row(name, lat_ms, n, seconds, extra=None):
    lat = np.asarray(lat_ms)
    out = {
        "mode": name,
        "requests": int(n),
        "p50_ms": round(float(np.percentile(lat, 50)), 2),
        "p95_ms": round(float(np.percentile(lat, 95)), 2),
        "throughput_rps": round(n / seconds, 1),
    }
    if extra:
        out.update(extra)
    print(json.dumps(out), flush=True)
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--max-steps", type=int, default=50)
    p.add_argument("--requests", type=int, default=200)
    p.add_argument("--out", type=str,
                   default=os.path.join(os.path.dirname(__file__),
                                        "_parity", "latency_packing.json"))
    args = p.parse_args(argv)

    fn1, fnB, feats1 = build(args.batch_size, args.max_steps)
    rows = []

    # 1) dedicated dispatch per request
    lats = []
    t0 = time.time()
    for _ in range(args.requests // 4):
        t = time.time()
        np.asarray(fn1(feats1))  # fetch is the completion barrier
        lats.append((time.time() - t) * 1e3)
    rows.append(row("sequential_B1", lats, len(lats), time.time() - t0))

    # 2) MicroBatcher under closed-loop concurrency
    from concurrent.futures import ThreadPoolExecutor

    from captionax.decode.serving import MicroBatcher

    feat_req = feats1[0]
    for clients in (1, 4, 16, 64):
        n = args.requests if clients > 1 else args.requests // 4
        with MicroBatcher(fnB, args.batch_size, (R, NF)) as mb:
            lats = []
            lock = __import__("threading").Lock()

            def client(n_req):
                for _ in range(n_req):
                    t = time.time()
                    mb.submit(feat_req).result(timeout=120)
                    dt = (time.time() - t) * 1e3
                    with lock:
                        lats.append(dt)

            t0 = time.time()
            with ThreadPoolExecutor(max_workers=clients) as pool:
                per = n // clients
                list(pool.map(client, [per] * clients))
            rows.append(row(
                f"microbatch_c{clients}", lats, len(lats),
                time.time() - t0,
                {"clients": clients, "compiled_batch": args.batch_size},
            ))

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

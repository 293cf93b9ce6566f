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


def build(batch_size: int, max_steps: int, payload: str = "f32"):
    """payload selects what each REQUEST uploads through the relay —
    the measured bottleneck (~30 MB/s + ~28 ms floor, so per-request
    bytes dominate end-to-end latency):

    - ``f32``   — [49, 2048] f32 features, 392 KB/request
    - ``bf16``  — the same features in bfloat16, 196 KB/request
      (upcast on device; beam kernel consumes f32)
    - ``image`` — [224, 224, 3] uint8, 147 KB/request; the dispatch
      runs preprocess + frozen ResNet-152 + beam on-device (the
      production interface: callers hold images, not features)
    """
    from captionax.core.runtime import setup_runtime

    setup_runtime()
    import jax
    import jax.numpy as jnp

    from captionax.decode.serving import pack_beam_result
    from captionax.models import decoder as dec
    from captionax.models.hypernet import hypernet_init
    from captionax.ops.decode_kernel import fused_beam_search
    from captionax.train.steps import synthesize_theta

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "decoder": dec.attention_gru_init(k1, NF, FO, E, H, V),
        "hn": hypernet_init(k2, hyper_emb=E, input_dim=E + FO,
                            hidden_dim=H),
    }
    theta = jax.jit(synthesize_theta)(params, np.int32(4))

    # params/theta as jit ARGUMENTS (device-resident), never closed-over
    # constants (CLAUDE.md relay rule: constants inflate the compile
    # payload)
    if payload == "image":
        from captionax.data.transforms import preprocess_images
        from captionax.models.encoder import encoder_cnn, resnet_init

        enc = jax.device_put(resnet_init(k3, depth=152))

        @jax.jit
        def decode(ep, dp, th, imgs):
            f = encoder_cnn(ep, preprocess_images(imgs))
            return pack_beam_result(fused_beam_search(
                dp, f, gru_params=th, max_steps=max_steps,
            ))

        dp = jax.device_put(params["decoder"])
        th = jax.device_put(theta)
        fn = lambda x: decode(enc, dp, th, x)
        req = np.random.default_rng(0).integers(
            0, 256, size=(224, 224, 3), dtype=np.uint8)
        req_shape, req_dtype = (224, 224, 3), np.uint8
    else:
        @jax.jit
        def decode(dp, th, f):
            f = f.astype(jnp.float32)
            return pack_beam_result(fused_beam_search(
                dp, f, gru_params=th, max_steps=max_steps,
            ))

        dp = jax.device_put(params["decoder"])
        th = jax.device_put(theta)
        fn = lambda x: decode(dp, th, x)
        dt = jnp.bfloat16 if payload == "bf16" else np.float32
        req = np.random.default_rng(0).normal(size=(R, NF)).astype(dt)
        req_shape, req_dtype = (R, NF), dt

    # warm both compiled shapes
    np.asarray(fn(req[None]))
    np.asarray(fn(np.stack([req] * batch_size)))
    return fn, req, req_shape, req_dtype


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
    p.add_argument("--payload", type=str, default="f32",
                   choices=["f32", "bf16", "image"])
    p.add_argument("--out", type=str,
                   default=os.path.join(os.path.dirname(__file__),
                                        "_parity", "latency_packing.json"))
    args = p.parse_args(argv)

    fn, req, req_shape, req_dtype = build(args.batch_size, args.max_steps,
                                          args.payload)
    rows = []
    tag = f"{args.payload}"

    # 1) dedicated dispatch per request
    lats = []
    t0 = time.time()
    for _ in range(args.requests // 4):
        t = time.time()
        np.asarray(fn(req[None]))  # fetch is the completion barrier
        lats.append((time.time() - t) * 1e3)
    rows.append(row(f"sequential_B1_{tag}", lats, len(lats),
                    time.time() - t0))

    # 2) MicroBatcher under closed-loop concurrency
    from concurrent.futures import ThreadPoolExecutor

    from captionax.decode.serving import MicroBatcher

    for clients in (1, 4, 16, 64):
        n = args.requests if clients > 1 else args.requests // 4
        with MicroBatcher(fn, args.batch_size, req_shape,
                          feature_dtype=req_dtype) as mb:
            lats = []
            lock = __import__("threading").Lock()

            def client(n_req):
                for _ in range(n_req):
                    t = time.time()
                    mb.submit(req).result(timeout=120)
                    dt = (time.time() - t) * 1e3
                    with lock:
                        lats.append(dt)

            t0 = time.time()
            with ThreadPoolExecutor(max_workers=clients) as pool:
                per = n // clients
                list(pool.map(client, [per] * clients))
            rows.append(row(
                f"microbatch_{tag}_c{clients}", lats, len(lats),
                time.time() - t0,
                {"clients": clients, "compiled_batch": args.batch_size},
            ))

    out_path = args.out.replace(".json", f"_{tag}.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()

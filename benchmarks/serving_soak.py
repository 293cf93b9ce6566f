"""Sustained-load serving soak on the real chip: stability, not peaks.

The burst benchmarks (serving_http.py, tests/test_service.py) measure
rps over ~200 requests; production serving runs for hours.  This drives
the full HTTP stack (real JPEG -> native decode -> ResNet-152 -> fused
mixed-style beam through the MicroBatcher) with a fixed closed-loop
client pool for ``--minutes``, sampling every ``--interval`` seconds:

- interval requests/s and p50/p99 latency (detects relay/dispatch decay),
- host RSS via /proc/self/status (detects leaks in the service's
  dispatch/result plumbing — buffers, futures, thread queues),
- error count (must stay 0).

The summary compares the first and last thirds: a healthy service shows
rps drift within noise and bounded RSS growth after warm-up.  No
reference equivalent (it has no serving story at all).

    nohup python benchmarks/serving_soak.py --minutes 10 \
        > /tmp/serving_soak.log 2>&1 &
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

from benchmarks.serving_http import build_service  # noqa: E402


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return float("nan")


def guarded_soak(args, styles):
    """Soak against SUPERVISED workers: bounded RSS across recycles,
    zero client-visible errors is the pass criterion."""
    import subprocess  # noqa: F401  (supervisor spawns workers)

    from captionax.decode.supervise import RssSupervisor, proc_rss_mb

    worker_argv = [
        sys.executable, os.path.abspath(__file__), "--_worker",
        "--port", str(args.port), "--window", str(args.window),
        "--max-steps", str(args.max_steps), "--styles", args.styles,
    ]
    # shared-listener handover (one kernel accept queue across worker
    # generations — hitless) + pre-arm spawn at 80% of the RSS limit
    sup = RssSupervisor(worker_argv, args.rss_limit_mb,
                        listen_port=args.port,
                        prearm_frac=args.prearm_frac)
    sup_thread = threading.Thread(target=sup.run, daemon=True)
    sup_thread.start()
    # wait until the first worker serves
    jpeg = open(os.path.join(os.path.dirname(__file__), os.pardir, "tests",
                             "fixtures", "images", "photo_gradient.jpg"),
                "rb").read()

    def post(style):
        req = urllib.request.Request(
            f"http://127.0.0.1:{args.port}/caption?style={style}",
            data=jpeg, headers={"Content-Type": "image/jpeg"},
        )
        with urllib.request.urlopen(req, timeout=1200) as r:
            return json.loads(r.read())

    t0 = time.time()
    while True:
        try:
            post(styles[0])
            break
        except Exception:
            if time.time() - t0 > 1800:
                raise
            time.sleep(2.0)
    print(f"first request served after {time.time() - t0:.1f} s", flush=True)

    stop = threading.Event()
    lock = threading.Lock()
    lats, errs = [], []

    def client(ci):
        j = 0
        while not stop.is_set():
            style = styles[(ci + j) % len(styles)]
            t = time.time()
            try:
                post(style)
            except Exception as e:
                with lock:
                    errs.append(repr(e))
                continue
            finally:
                j += 1
            with lock:
                lats.append((time.time() - t) * 1e3)

    threads = [threading.Thread(target=client, args=(ci,), daemon=True)
               for ci in range(args.clients)]
    soak_t0 = time.time()
    for t in threads:
        t.start()
    samples = []
    deadline = soak_t0 + args.minutes * 60
    while time.time() < deadline:
        time.sleep(args.interval)
        with lock:
            window, lats = lats, []
            n_err = len(errs)
        lat = np.asarray(window) if window else np.asarray([np.nan])
        pid = sup.current.pid if sup.current else -1
        s = {
            "t_s": round(time.time() - soak_t0, 1),
            "rps": round(len(window) / args.interval, 1),
            "p50_ms": round(float(np.nanpercentile(lat, 50)), 1),
            "p99_ms": round(float(np.nanpercentile(lat, 99)), 1),
            "worker_rss_mb": round(proc_rss_mb(pid) or float("nan"), 1),
            "recycles": sup.recycles,
            "errors_total": n_err,
        }
        samples.append(s)
        print(json.dumps(s), flush=True)
    stop.set()
    for t in threads:
        t.join(timeout=60)
    sup.stop()
    sup_thread.join(timeout=180)

    rss_vals = [s["worker_rss_mb"] for s in samples
                if np.isfinite(s["worker_rss_mb"])]
    third = max(1, len(samples) // 3)
    mean = lambda rows, k: float(np.mean([r[k] for r in rows]))
    summary = {
        "mode": "guarded",
        "rss_limit_mb": args.rss_limit_mb,
        "minutes": args.minutes,
        "clients": args.clients,
        "recycles": samples[-1]["recycles"] if samples else 0,
        "worker_rss_max_mb": max(rss_vals) if rss_vals else None,
        "rps_first_third": round(mean(samples[:third], "rps"), 1),
        "rps_last_third": round(mean(samples[-third:], "rps"), 1),
        "p99_last_third_ms": round(mean(samples[-third:], "p99_ms"), 1),
        "errors_total": samples[-1]["errors_total"] if samples else 0,
    }
    print("SUMMARY", json.dumps(summary), flush=True)
    # idempotent suffix: `--out ..._guarded.json` must not double up
    # (the r4 artifact shipped as serving_soak_guarded_guarded.json)
    out = (args.out if args.out.endswith("_guarded.json")
           else args.out.replace(".json", "_guarded.json"))
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump({"samples": samples, "summary": summary}, f, indent=1)
    print(f"wrote {out}", flush=True)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--minutes", type=float, default=10.0)
    p.add_argument("--interval", type=float, default=15.0)
    p.add_argument("--clients", type=int, default=32)
    p.add_argument("--window", type=int, default=32)
    p.add_argument("--max-steps", type=int, default=50)
    p.add_argument("--styles", type=str, default="factual,humour,romantic")
    p.add_argument("--rss-limit-mb", type=float, default=0.0,
                   help="run the service in supervised worker processes "
                        "(captionax.decode.supervise) rolled at this RSS "
                        "bound — the guarded soak; 0 = the bare in-process "
                        "soak that measures the relay leak itself")
    p.add_argument("--port", type=int, default=18431)
    p.add_argument("--prearm-frac", type=float, default=0.8,
                   help="guarded mode: spawn the replacement worker at "
                        "this fraction of --rss-limit-mb so the switch "
                        "at the limit is immediate (bounds the RSS "
                        "overshoot to ~one poll interval of leak)")
    p.add_argument("--_worker", action="store_true", help=argparse.SUPPRESS)
    p.add_argument("--listen-fd", type=int, default=-1,
                   help=argparse.SUPPRESS)
    p.add_argument("--standby", action="store_true", help=argparse.SUPPRESS)
    p.add_argument("--out", type=str,
                   default=os.path.join(os.path.dirname(__file__),
                                        "_parity", "serving_soak.json"))
    args = p.parse_args(argv)

    styles = args.styles.split(",")

    if getattr(args, "_worker", False):
        # supervised worker: same service as the bare soak, serving on
        # the shared port with graceful SIGTERM drain
        import numpy as np_  # noqa: F401

        from captionax.decode.supervise import run_worker

        service = build_service(args.window, args.max_steps, styles)

        def warm(svc):
            import numpy as np

            svc.caption_array(
                np.zeros((svc.image_size, svc.image_size, 3), np.uint8),
                styles[0])

        run_worker(service, "127.0.0.1", args.port, warmup=warm,
                   listen_fd=args.listen_fd if args.listen_fd >= 0 else None,
                   standby=args.standby)
        return

    if args.rss_limit_mb > 0:
        return guarded_soak(args, styles)
    jpeg = open(os.path.join(os.path.dirname(__file__), os.pardir, "tests",
                             "fixtures", "images", "photo_gradient.jpg"),
                "rb").read()
    service = build_service(args.window, args.max_steps, styles)
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
    post(styles[0])
    print(f"first request (compile) {time.time() - t0:.1f} s", flush=True)

    stop = threading.Event()
    lock = threading.Lock()
    lats, errs = [], []  # drained each sample interval

    def client(ci):
        j = 0
        while not stop.is_set():
            style = styles[(ci + j) % len(styles)]
            t = time.time()
            try:
                post(style)
            except Exception as e:
                with lock:
                    errs.append(repr(e))
                continue
            finally:
                j += 1
            with lock:
                lats.append((time.time() - t) * 1e3)

    threads = [threading.Thread(target=client, args=(ci,), daemon=True)
               for ci in range(args.clients)]
    soak_t0 = time.time()
    for t in threads:
        t.start()

    samples = []
    deadline = soak_t0 + args.minutes * 60
    while time.time() < deadline:
        time.sleep(args.interval)
        with lock:
            window, lats = lats, []
            n_err = len(errs)
        lat = np.asarray(window) if window else np.asarray([np.nan])
        s = {
            "t_s": round(time.time() - soak_t0, 1),
            "rps": round(len(window) / args.interval, 1),
            "p50_ms": round(float(np.nanpercentile(lat, 50)), 1),
            "p99_ms": round(float(np.nanpercentile(lat, 99)), 1),
            "rss_mb": round(rss_mb(), 1),
            "errors_total": n_err,
        }
        samples.append(s)
        print(json.dumps(s), flush=True)
    stop.set()
    for t in threads:
        t.join(timeout=60)

    third = max(1, len(samples) // 3)
    first, last = samples[:third], samples[-third:]
    mean = lambda rows, k: float(np.mean([r[k] for r in rows]))
    summary = {
        "minutes": args.minutes,
        "clients": args.clients,
        "samples": len(samples),
        "rps_first_third": round(mean(first, "rps"), 1),
        "rps_last_third": round(mean(last, "rps"), 1),
        "rps_drift_pct": round(
            100 * (mean(last, "rps") / max(mean(first, "rps"), 1e-9) - 1), 1
        ),
        "p99_first_third_ms": round(mean(first, "p99_ms"), 1),
        "p99_last_third_ms": round(mean(last, "p99_ms"), 1),
        "rss_start_mb": samples[0]["rss_mb"],
        "rss_end_mb": samples[-1]["rss_mb"],
        "rss_growth_mb": round(
            samples[-1]["rss_mb"] - samples[0]["rss_mb"], 1
        ),
        "errors_total": samples[-1]["errors_total"],
    }
    print("SUMMARY", json.dumps(summary), flush=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"samples": samples, "summary": summary}, f, indent=1)
    print(f"wrote {args.out}", flush=True)
    srv.shutdown()
    service.close()


if __name__ == "__main__":
    main()

"""Rolling-restart supervisor: hitless handover under load (CPU).

The r4 guarded soak (serving_soak_guarded.json) showed 2 client-visible
errors at the drain moments: with SO_REUSEPORT each worker generation
has its OWN kernel accept queue, and Linux resets whatever sits in a
queue when its socket closes.  The shared-listener design (supervisor
binds once, workers inherit the fd => ONE accept queue across
generations) makes the retiring worker's shutdown strand nothing.

This test forces continuous recycling (RSS limit far below a Python
process's baseline) while a concurrent client pool hammers the port,
and asserts ZERO errors across >= 2 handovers — the criterion VERDICT
r4 set for the re-soak, checked here at the protocol level without the
chip.
"""

import json
import sys
import threading
import time
import urllib.request

import pytest

from captionax.decode.supervise import RssSupervisor

STUB = '''
import argparse
import sys
import time

sys.path.insert(0, {pkg!r})

p = argparse.ArgumentParser()
p.add_argument("--listen-fd", type=int, default=-1)
p.add_argument("--standby", action="store_true")
a = p.parse_args()

from captionax.decode.supervise import run_worker


class Dummy:
    styles = ["factual"]
    decode = "greedy"

    def stats(self):
        return {{"served": 0}}

    def caption_bytes(self, data, style):
        time.sleep(0.02)
        return {{"caption": "ok", "style": style}}

    def close(self):
        pass


run_worker(Dummy(), "127.0.0.1", 0, drain_grace_s=1.0,
           listen_fd=a.listen_fd if a.listen_fd >= 0 else None,
           standby=a.standby)
'''


def test_hitless_rolling_restart(tmp_path):
    import os

    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    stub = tmp_path / "worker_stub.py"
    stub.write_text(STUB.format(pkg=pkg_root))

    # limit far below the Python baseline RSS => the supervisor rolls the
    # worker continuously, i.e. every few seconds a handover happens
    # while clients are mid-flight
    sup = RssSupervisor([sys.executable, str(stub)], rss_limit_mb=20.0,
                        poll_s=0.3, listen_port=0, prearm_frac=0.8,
                        exit_grace_s=15.0, ready_timeout_s=120.0)
    assert sup.port, "supervisor must own the bound port"
    t = threading.Thread(target=sup.run, daemon=True)
    t.start()

    stop = threading.Event()
    errors, served = [], []
    lock = threading.Lock()

    def client(ci):
        while not stop.is_set():
            req = urllib.request.Request(
                f"http://127.0.0.1:{sup.port}/caption?style=factual",
                data=b"x", headers={"Content-Type": "image/jpeg"})
            try:
                with urllib.request.urlopen(req, timeout=30) as r:
                    out = json.loads(r.read())
                with lock:
                    served.append(out["caption"])
            except Exception as e:  # noqa: BLE001 — every error counts
                with lock:
                    errors.append(repr(e))

    threads = [threading.Thread(target=client, args=(ci,), daemon=True)
               for ci in range(8)]
    for th in threads:
        th.start()

    deadline = time.time() + 60
    while time.time() < deadline and sup.recycles < 2:
        time.sleep(0.5)
    stop.set()
    for th in threads:
        th.join(timeout=30)
    sup.stop()
    t.join(timeout=60)

    assert sup.recycles >= 2, f"expected >=2 recycles, got {sup.recycles}"
    assert not errors, f"hitless handover violated: {errors[:5]}"
    assert len(served) > 10

"""RssSupervisor mechanics with a stub worker (no jax, no HTTP): spawn,
readiness gating, RSS-triggered rolling recycle, graceful retirement.
The full serve handover is driven by benchmarks/serving_soak.py
--rss-limit-mb on the real chip."""

import os
import sys
import textwrap
import threading
import time

from captionax.decode.supervise import READY_MARK, RssSupervisor, proc_rss_mb

STUB = textwrap.dedent("""
    import signal, sys, time
    stop = []
    signal.signal(signal.SIGTERM, lambda *a: stop.append(1))
    ballast = bytearray(64 * 1024 * 1024)  # ~64 MB RSS
    print("{mark} port=0 pid=x", flush=True)
    t0 = time.time()
    while not stop and time.time() - t0 < 60:
        time.sleep(0.05)
    print("worker exiting", flush=True)
""").format(mark=READY_MARK)


def write_stub(tmp_path):
    p = tmp_path / "stub_worker.py"
    p.write_text(STUB)
    return str(p)


class TestSupervisor:
    def test_proc_rss_self(self):
        rss = proc_rss_mb(os.getpid())
        assert rss is not None and rss > 1

    def test_recycles_on_rss_and_retires(self, tmp_path):
        stub = write_stub(tmp_path)
        # 16 MB limit < the stub's 64 MB ballast -> every worker rolls
        sup = RssSupervisor([sys.executable, stub], rss_limit_mb=16,
                            poll_s=0.2, exit_grace_s=10)
        th = threading.Thread(target=sup.run, daemon=True)
        th.start()
        deadline = time.time() + 30
        while sup.recycles < 2 and time.time() < deadline:
            time.sleep(0.1)
        assert sup.recycles >= 2, sup.recycles
        live = sup.current
        assert live is not None and live.poll() is None
        sup.stop()
        th.join(timeout=30)
        assert not th.is_alive()
        assert live.poll() is not None  # retired on stop

    def test_no_recycle_under_limit(self, tmp_path):
        stub = write_stub(tmp_path)
        sup = RssSupervisor([sys.executable, stub], rss_limit_mb=4096,
                            poll_s=0.2)
        th = threading.Thread(target=sup.run, daemon=True)
        th.start()
        time.sleep(2.0)
        assert sup.recycles == 0
        sup.stop()
        th.join(timeout=30)

"""Rolling-restart supervision for relay-attached serving workers.

Why this exists: the axon PJRT plugin in THIS image leaks host RSS 1:1
with every host->device transfer's bytes (root-caused in
benchmarks/serving_soak.py — stock-JAX soaks are flat, malloc_trim
reclaims nothing, so the leak cannot be freed in-process).  A day-scale
soak would exhaust 128 GB.  The operational fix is process recycling
with a zero-downtime handover:

- the WORKER serves HTTP on a fixed port bound with ``SO_REUSEPORT``
  and exits gracefully on SIGTERM (stop accepting, drain in-flight,
  close);
- the SUPERVISOR watches the worker's RSS via ``/proc/<pid>/status``;
  when it crosses ``rss_limit_mb`` it starts a REPLACEMENT worker on
  the same port (both listen concurrently — the kernel distributes new
  connections), waits for its ``WORKER_READY`` line (printed only
  after model build + a warmup dispatch, so the newcomer serves from
  a hot compile cache), then SIGTERMs the old worker.

In-flight requests on the old worker finish on its handler threads;
new connections land on the survivor.  ``benchmarks/serving_soak.py
--rss-limit-mb`` measures the result: bounded RSS across recycles with
zero client-visible errors.

No reference equivalent (the reference has no serving story at all);
this is the ops counterpart to `CaptionService.stats()`'s ``rss_mb``.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import threading
import time
from typing import List, Optional

READY_MARK = "WORKER_READY"


def proc_rss_mb(pid: int) -> Optional[float]:
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        return None
    return None


def run_worker(service, host: str, port: int, *,
               drain_grace_s: float = 10.0, warmup=None) -> None:
    """Serve ``service`` on (host, port) with SO_REUSEPORT + graceful
    SIGTERM drain.  Prints ``WORKER_READY port=<p>`` only after the
    optional ``warmup()`` ran (compile paid before the first request
    can arrive).  Blocks until SIGTERM."""
    from captionax.decode.service import make_http_server

    if warmup is not None:
        warmup(service)
    srv = make_http_server(service, host, port, reuse_port=True)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    stop = threading.Event()

    def on_term(signum, frame):
        stop.set()

    signal.signal(signal.SIGTERM, on_term)
    print(f"{READY_MARK} port={srv.server_address[1]} pid={os.getpid()}",
          flush=True)
    while not stop.wait(0.5):
        pass
    # graceful drain: stop accepting, let in-flight handler threads
    # finish, then release the device plumbing
    srv.shutdown()
    srv.server_close()
    time.sleep(drain_grace_s)
    service.close()
    print(f"worker {os.getpid()} drained and exiting", flush=True)


class RssSupervisor:
    """Spawn/monitor/recycle a serving worker subprocess.

    ``worker_argv`` must start a process that prints ``WORKER_READY``
    once it is serving (see :func:`run_worker`) and exits on SIGTERM.
    """

    def __init__(self, worker_argv: List[str], rss_limit_mb: float, *,
                 poll_s: float = 2.0, ready_timeout_s: float = 1800.0,
                 exit_grace_s: float = 120.0):
        self.worker_argv = list(worker_argv)
        self.rss_limit_mb = float(rss_limit_mb)
        self.poll_s = poll_s
        self.ready_timeout_s = ready_timeout_s
        self.exit_grace_s = exit_grace_s
        self.recycles = 0
        self.current: Optional[subprocess.Popen] = None
        self._stop = threading.Event()

    def _spawn(self) -> subprocess.Popen:
        # captionax may be run from a checkout rather than installed —
        # make sure the worker can import it wherever the supervisor
        # was launched from
        env = os.environ.copy()
        pkg_root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        env["PYTHONPATH"] = pkg_root + os.pathsep + env.get("PYTHONPATH", "")
        proc = subprocess.Popen(
            self.worker_argv, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True, bufsize=1, env=env,
        )
        ready = threading.Event()

        def pump():
            for line in proc.stdout:  # tee worker logs + catch READY
                sys.stdout.write(f"[worker {proc.pid}] {line}")
                sys.stdout.flush()
                if READY_MARK in line:
                    ready.set()
            # EOF: worker exited; unblock any waiter
            ready.set()

        threading.Thread(target=pump, daemon=True).start()
        deadline = time.time() + self.ready_timeout_s
        while not ready.is_set():
            if time.time() > deadline or proc.poll() is not None:
                proc.kill()
                raise RuntimeError(
                    f"worker {proc.pid} failed to become ready "
                    f"(exit={proc.poll()})")
            time.sleep(0.2)
        if proc.poll() is not None:
            raise RuntimeError(f"worker exited immediately ({proc.poll()})")
        return proc

    def _retire(self, proc: subprocess.Popen) -> None:
        proc.send_signal(signal.SIGTERM)
        try:
            proc.wait(timeout=self.exit_grace_s)
        except subprocess.TimeoutExpired:
            proc.kill()

    def stop(self):
        self._stop.set()

    def run(self) -> None:
        """Monitor loop; blocks until :meth:`stop` (or KeyboardInterrupt),
        then retires the live worker."""
        self.current = self._spawn()
        try:
            while not self._stop.wait(self.poll_s):
                if self.current.poll() is not None:
                    print(f"worker died (exit={self.current.poll()}); "
                          "respawning", flush=True)
                    self.current = self._spawn()
                    self.recycles += 1
                    continue
                rss = proc_rss_mb(self.current.pid)
                if rss is not None and rss > self.rss_limit_mb:
                    print(f"worker {self.current.pid} rss {rss:.0f} MB > "
                          f"limit {self.rss_limit_mb:.0f} MB; rolling",
                          flush=True)
                    old = self.current
                    self.current = self._spawn()  # overlap: both serving
                    self._retire(old)
                    self.recycles += 1
        except KeyboardInterrupt:
            pass
        finally:
            if self.current is not None and self.current.poll() is None:
                self._retire(self.current)

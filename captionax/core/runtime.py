"""Runtime setup: persistent compilation cache + profiling helpers.

Every CLI calls :func:`setup_runtime` first.  The persistent compilation
cache matters a lot in this environment: TPU compiles go through a remote
compile service (~30 s-several min per program), and the cache makes every
subsequent process start instantly for already-seen shapes.

Profiling (SURVEY.md §5 — the reference has no tracing at all): wrap any
region in :func:`trace` to dump a TensorBoard-compatible trace, and use
:class:`StepTimer` for lightweight per-step wall timings with correct
device synchronization (under the axon relay, ``block_until_ready`` is
not a completion barrier — a device->host transfer is).
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, List, Optional

_SETUP_DONE = False


def setup_runtime(cache_dir: str = "~/.cache/captionax-jax") -> None:
    """Enable the persistent compilation cache (idempotent)."""
    global _SETUP_DONE
    if _SETUP_DONE:
        return
    import jax

    path = os.path.expanduser(cache_dir)
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
    _SETUP_DONE = True


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/captionax-trace"):
    """jax.profiler trace context (view with TensorBoard/xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def device_barrier(x) -> None:
    """Reliable completion barrier: a tiny device->host transfer (the
    axon relay returns early from block_until_ready)."""
    import jax
    import numpy as np

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.numpy.ravel(leaf)[0])


def device_time(fn, *args, k: int = 4, iters: int = 5) -> float:
    """On-device seconds for one ``fn(*args)``, with the per-dispatch
    relay floor subtracted out.

    Every dispatch through the axon relay pays a ~23-28 ms floor
    (measured: a trivial ``jit(lambda v: v + 1)`` plus an 8-element
    fetch costs 23.3 ms), so wall-timing a single call overstates
    device cost by that much — at B=256 a whole ResNet stage and a
    single matmul time identically.  This helper chains ``k``
    applications of ``fn`` *inside one jit* (output fed back as input,
    so XLA cannot elide the repeats) and differences the k-rep and
    1-rep walls: the floor and the result fetch cancel exactly.

    ``fn`` must map its first argument to something of the same shape
    and dtype (wrap with a slice/cast if needed).  Remaining ``args``
    are passed through untouched.

    Accuracy: the floor jitters 23-34 ms call-to-call, so pick ``k``
    large enough that ``(k - 1) * expected_device_time`` is at least
    ~50 ms — calibration: a 4096-cubed bf16 matmul chain at k=64
    measures 192 TFLOP/s, 98% of the v5e spec peak (k=8 is jitter
    noise for sub-ms ops; the default k=4 suits ops >= ~20 ms).
    """
    import jax
    import numpy as np

    def rep(n):
        def run(x, *rest):
            for _ in range(n):
                x = fn(x, *rest)
            return jax.numpy.ravel(x)[:8]
        return jax.jit(run)

    def wall(jfn):
        np.asarray(jfn(*args))  # compile + warm
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            np.asarray(jfn(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1 = wall(rep(1))
    tk = wall(rep(k))
    return max(0.0, (tk - t1) / (k - 1))


def host_rss_mb() -> float:
    """Current process resident-set size in MB (0.0 if unreadable).

    Logged per epoch by the training harness because the axon PJRT
    plugin leaks host RSS 1:1 with host->device transfer bytes
    (CLAUDE.md): a flat rss_mb column is the evidence that a long run
    uses the leak-proof device-resident feature path."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return round(int(line.split()[1]) / 1024, 1)
    except OSError:
        pass
    return 0.0


class StepTimer:
    """Per-step wall timing with percentile summaries."""

    def __init__(self):
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, result=None) -> float:
        if result is not None:
            device_barrier(result)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        ts = sorted(self.times)
        n = len(ts)
        return {
            "steps": n,
            "mean_ms": sum(ts) / n * 1e3,
            "p50_ms": ts[n // 2] * 1e3,
            "p90_ms": ts[min(int(n * 0.9), n - 1)] * 1e3,
            "max_ms": ts[-1] * 1e3,
        }

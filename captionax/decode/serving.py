"""Pipelined batch serving for the fused decode kernels.

Per-dispatch overhead through the axon relay is ~28 ms (BASELINE.md), so a
synchronous submit->fetch loop wastes ~40% of wall-clock at B=1024.
:class:`PipelinedDecoder` keeps one dispatch in flight: while the device
decodes batch i+1, the host fetches batch i — stream throughput approaches
the kernel's marginal rate.

For 1-at-a-time arrivals the same floor dominates per-REQUEST latency:
a dedicated dispatch per request can never beat ~28 ms and collapses
under load (every request pays the full floor serially).
:class:`MicroBatcher` instead coalesces every request that arrives
during the current dispatch window into the next fixed-shape batch —
the floor is paid once per WINDOW, not per request, so sustainable
throughput is batch-rate while individual latency stays ~1-2 windows.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

import jax
import numpy as np


class PipelinedDecoder:
    """Wrap a jitted decode fn with depth-N dispatch pipelining.

    ``decode_fn(features) -> result pytree``; results are fetched to host
    (numpy) in submission order.  ``depth`` is how many dispatches stay
    in flight before the oldest is fetched.  Measured at B=1024 on the
    relay: depth 1/2/3 all sustain ~40.2 ms/batch vs the kernel's
    36.1 ms device time — the residual gap is serial per-dispatch host
    cost, NOT jitter, so deeper pipelining buys nothing here; depth
    stays a knob for hosts where fetch latency varies.
    """

    def __init__(self, decode_fn: Callable, depth: int = 1):
        self.decode_fn = decode_fn
        self.depth = max(1, depth)

    def map(self, feature_batches: Iterable) -> Iterator:
        """Stream items are either ``features`` arrays or — for
        mixed-style servers — ``(features, style_rows)`` tuples, splatted
        into ``decode_fn``."""
        from collections import deque

        pending = deque()
        for feats in feature_batches:
            if isinstance(feats, tuple):
                result = self.decode_fn(*feats)  # async dispatch
            else:
                result = self.decode_fn(feats)
            pending.append(result)
            if len(pending) > self.depth:
                yield jax.tree_util.tree_map(np.asarray, pending.popleft())
        while pending:
            yield jax.tree_util.tree_map(np.asarray, pending.popleft())


class MicroBatcher:
    """Coalesce concurrent single-caption requests into fixed-shape
    dispatches.

    ``decode_fn(features[, style_rows]) -> result pytree`` must be a
    jitted fixed-batch function (one compiled shape — padding rows are
    decoded and discarded, which is free: the kernel's cost is set by
    the batch shape either way).  ``submit()`` is thread-safe and
    returns a ``concurrent.futures.Future`` resolving to the request's
    slice of the result pytree (leading batch axis stripped).

    One worker thread owns the device: it drains every queued request
    (up to ``batch_size``), dispatches, fetches, and resolves futures.
    While a dispatch is in flight new arrivals accumulate — under load
    the effective per-request cost approaches dispatch_floor /
    batch_size instead of dispatch_floor (measured in
    ``benchmarks/latency_packing.py``).
    """

    def __init__(
        self,
        decode_fn: Callable,
        batch_size: int,
        feature_shape,
        styled: bool = False,
        feature_dtype=np.float32,
    ):
        self.decode_fn = decode_fn
        self.B = batch_size
        self.styled = styled
        self._feats = np.zeros((batch_size,) + tuple(feature_shape),
                               feature_dtype)
        self._rows = np.zeros((batch_size,), np.int32)
        self._q: queue.Queue = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, features: np.ndarray, style_row: int = 0):
        from concurrent.futures import Future

        fut: Future = Future()
        self._q.put((features, style_row, fut))
        return fut

    def close(self):
        self._stop.set()
        self._q.put(None)  # wake the worker
        self._thread.join(timeout=10)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def _loop(self):
        while not self._stop.is_set():
            item = self._q.get()
            if item is None:
                continue
            pending = [item]
            while len(pending) < self.B:
                try:
                    nxt = self._q.get_nowait()
                except queue.Empty:
                    break
                if nxt is not None:
                    pending.append(nxt)
            # a bad request (wrong shape/dtype, device error) must fail
            # ITS futures, not kill the worker — a dead worker would hang
            # every later submit() forever
            try:
                n = len(pending)
                for i, (f, row, _) in enumerate(pending):
                    self._feats[i] = f
                    self._rows[i] = row
                self._feats[n:] = 0.0
                if self.styled:
                    res = self.decode_fn(self._feats, self._rows)
                else:
                    res = self.decode_fn(self._feats)
                host = jax.tree_util.tree_map(np.asarray, res)
            except Exception as e:  # noqa: BLE001 — propagate to callers
                for _, _, fut in pending:
                    if not fut.done():
                        fut.set_exception(e)
                continue
            for i, (_, _, fut) in enumerate(pending):
                fut.set_result(
                    jax.tree_util.tree_map(lambda a, i=i: a[i], host)
                )


def pack_beam_result(res):
    """BeamResult -> ONE int32 array [B, T+3]: tokens ‖ length ‖ found ‖
    score-bits.  Device->host fetches through the relay cost ~30 ms PER
    ARRAY regardless of size, so a packed single-buffer result quarters
    the fetch cost."""
    import jax.numpy as jnp

    score_bits = jax.lax.bitcast_convert_type(
        res.scores.astype(jnp.float32), jnp.int32
    )
    return jnp.concatenate(
        [
            res.tokens,
            res.lengths[:, None].astype(jnp.int32),
            res.found[:, None].astype(jnp.int32),
            score_bits[:, None],
        ],
        axis=1,
    )


def unpack_beam_result(packed: np.ndarray):
    """Inverse of pack_beam_result (host side, numpy)."""
    from captionax.decode.search import BeamResult

    tokens = packed[:, :-3]
    lengths = packed[:, -3]
    found = packed[:, -2].astype(bool)
    scores = packed[:, -1].view(np.float32)
    return BeamResult(tokens, scores, found, lengths)


def make_beam_server(
    decoder_params,
    gru_params=None,
    k: int = 3,
    max_steps: int = 50,
    use_fused: bool = True,
    packed: bool = False,
) -> PipelinedDecoder:
    """Ready-made styled-caption beam server.  With ``packed=True`` the
    stream yields single int32 arrays (use :func:`unpack_beam_result`).

    Mixed-style batches: pass ``gru_params`` as a theta BANK with a
    leading style axis (from ``synthesize_theta_batched`` over the S
    style embeddings).  The stream then takes ``(features, style_rows)``
    tuples with ``style_rows`` [B] int32 in [0, S) — one kernel launch
    serves every style at once (the reference can only decode
    batch-homogeneous styles, data_loader.py:287-298).

    Synthesize the bank EAGERLY (its own dispatch), as this function's
    callers do: fusing the BATCHED (vmapped) hypernet synthesis into the
    same jit as the Pallas kernel crashes the relay's AOT compile helper
    at production dims (benchmarks/README.md, negative results;
    single-style synthesize_theta fuses fine).  The bank changes only
    when the hypernet or style set changes, so this costs one dispatch
    per server build, not per batch."""
    multi = gru_params is not None and gru_params["w_ih"].ndim == 3
    if use_fused:
        from captionax.ops.decode_kernel import fused_beam_search

        if multi:
            def decode(f, rows):
                return fused_beam_search(
                    decoder_params, f, gru_params=gru_params,
                    max_steps=max_steps, style_rows=rows,
                )
        else:
            def decode(f):
                return fused_beam_search(
                    decoder_params, f, gru_params=gru_params,
                    max_steps=max_steps,
                )
    else:
        from captionax.decode.search import beam_search

        if multi:
            def decode(f, rows):
                # scan path consumes per-image theta rows, not a bank
                theta = jax.tree_util.tree_map(
                    lambda t: t[rows], gru_params
                )
                return beam_search(
                    decoder_params, f, k=k, max_steps=max_steps,
                    gru_params=theta,
                )
        else:
            def decode(f):
                return beam_search(
                    decoder_params, f, k=k, max_steps=max_steps,
                    gru_params=gru_params,
                )

    if packed:
        if multi:
            fn = jax.jit(lambda f, r: pack_beam_result(decode(f, r)))
        else:
            fn = jax.jit(lambda f: pack_beam_result(decode(f)))
    else:
        fn = jax.jit(decode)
    return PipelinedDecoder(fn)


def make_sharded_beam_decode(
    mesh,
    decoder_params,
    gru_params=None,
    max_steps: int = 50,
    block_images: Optional[int] = None,
    interpret: bool = False,
    f32: bool = False,
    packed: bool = False,
) -> Callable:
    """Multi-chip fused beam search: one kernel launch per device over a
    ``data``-sharded feature batch.

    The fused Pallas kernel (captionax.ops.decode_kernel) is a per-chip
    program; scaling it over a slice is pure data parallelism — no
    cross-chip communication exists in decoding, so ``shard_map`` over the
    mesh's ``data`` axis gives linear throughput in chips (the reference
    has no multi-device inference at all, SURVEY.md §2.10).

    Returns a jitted ``decode(features [B, R, F]) -> BeamResult`` with B
    split over ``data`` (B must divide by the data-axis size; pad the tail
    batch with zero rows and drop them host-side).  Params and theta are
    replicated — they are the same for every image, exactly like the
    single-chip server.  ``interpret=True`` runs the kernel in Pallas
    interpret mode so the SPMD wiring is testable on a CPU mesh.

    ``packed=True`` returns one int32 buffer per batch (pack_beam_result)
    — through the axon relay device->host fetches cost ~30 ms per ARRAY,
    so multi-chip streams should use ``packed=True`` and wrap the result
    in :class:`PipelinedDecoder`, exactly like the single-chip server:

        decode = make_sharded_beam_decode(mesh, params, packed=True)
        for buf in PipelinedDecoder(decode).map(batches):
            res = unpack_beam_result(buf)
    """
    from functools import partial

    from jax.sharding import PartitionSpec as P

    from captionax.ops.decode_kernel import fused_beam_search

    multi = gru_params is not None and gru_params["w_ih"].ndim == 3
    if multi:
        # theta bank replicated, per-row style ids sharded with the batch:
        # decode(features, style_rows)
        def local_decode(params, theta, feats, rows):
            return fused_beam_search(
                params, feats, gru_params=theta, max_steps=max_steps,
                block_images=block_images, interpret=interpret, f32=f32,
                style_rows=rows,
            )

        in_specs = (P(), P(), P("data"), P("data"))
    else:
        def local_decode(params, theta, feats):
            return fused_beam_search(
                params, feats, gru_params=theta, max_steps=max_steps,
                block_images=block_images, interpret=interpret, f32=f32,
            )

        in_specs = (P(), P(), P("data"))

    sharded = jax.shard_map(
        local_decode,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=P("data"),
        check_vma=False,  # pallas_call is opaque to varying-manual-axes checks
    )
    fn = partial(sharded, decoder_params, gru_params)
    if packed:
        if multi:
            return jax.jit(lambda feats, rows: pack_beam_result(fn(feats, rows)))
        return jax.jit(lambda feats: pack_beam_result(fn(feats)))
    return jax.jit(fn)


def make_greedy_server(
    decoder_params,
    gru_params=None,
    max_len: int = 20,
    use_fused: bool = True,
) -> PipelinedDecoder:
    """Greedy-decode counterpart of :func:`make_beam_server` (the
    reference's greedy_search/infer path, models/decoderlstm.py:138-184);
    the stream yields int32 token arrays [B, max_len].  A theta-bank
    ``gru_params`` makes the stream take ``(features, style_rows)``
    tuples, exactly like the beam server."""
    multi = gru_params is not None and gru_params["w_ih"].ndim == 3
    if use_fused:
        from captionax.ops.decode_kernel import fused_greedy

        if multi:
            def decode(f, rows):
                return fused_greedy(decoder_params, f, gru_params=gru_params,
                                    max_len=max_len, style_rows=rows)
        else:
            def decode(f):
                return fused_greedy(decoder_params, f, gru_params=gru_params,
                                    max_len=max_len)
    else:
        from captionax.decode.search import greedy

        if multi:
            def decode(f, rows):
                theta = jax.tree_util.tree_map(
                    lambda t: t[rows], gru_params
                )
                return greedy(decoder_params, f, max_len=max_len,
                              gru_params=theta)
        else:
            def decode(f):
                return greedy(decoder_params, f, max_len=max_len,
                              gru_params=gru_params)

    return PipelinedDecoder(jax.jit(decode))

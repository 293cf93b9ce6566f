"""Host->device batch pipeline with background prefetch.

Replaces the reference's torch DataLoader worker processes
(num_workers=1..24, SURVEY.md §2.10) with a thread that assembles the next
batches while the device computes, then ``jax.device_put``s them (sharded
over the mesh when given).  Image preprocessing (resize + normalize) runs
on device via captionax.data.transforms.preprocess_images.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional

import jax


class BatchLoader:
    """Wrap a host batch iterable with N-deep background prefetch."""

    _SENTINEL = object()

    def __init__(
        self,
        batches: Iterable[dict],
        mesh=None,
        prefetch: int = 2,
        device_keys: Optional[tuple] = ("images", "captions", "features"),
    ):
        self.batches = batches
        self.mesh = mesh
        self.prefetch = prefetch
        self.device_keys = device_keys

    def _put(self, batch: dict) -> dict:
        out = {}
        for k, v in batch.items():
            if self.device_keys and k in self.device_keys:
                if self.mesh is not None:
                    from captionax.parallel.mesh import batch_sharding

                    out[k] = jax.device_put(
                        v, batch_sharding(self.mesh, v.ndim)
                    )
                else:
                    out[k] = jax.device_put(v)
            else:
                out[k] = v
        return out

    def __iter__(self) -> Iterator[dict]:
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        err = []

        def worker():
            try:
                for batch in self.batches:
                    q.put(self._put(batch))
            except Exception as e:  # propagate into the consumer
                err.append(e)
            finally:
                q.put(self._SENTINEL)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is self._SENTINEL:
                if err:
                    raise err[0]
                return
            yield item

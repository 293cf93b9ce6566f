"""Device mesh construction and sharding rules.

The reference has no active parallelism (DDP commented out everywhere,
SURVEY.md §2.10); here data-parallel SPMD over a TPU mesh is first-class.
Axes:

- ``data``  — batch axis; gradients all-reduce over ICI automatically once
  batch inputs are sharded and params are replicated (XLA inserts the
  psum under jit).
- ``model`` — reserved for tensor parallelism of the vocab projection
  (V≈9.7k) and the 2048-dim encoder at larger scales; size 1 by default.

All helpers work identically on a real TPU slice and on the virtual
8-device CPU platform used by tests and ``dryrun_multichip``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    use = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(use, ("data", "model"))


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over ``data``; replicate the rest.
    Scalars (ndim 0, e.g. a batch-homogeneous style id) are replicated."""
    if ndim == 0:
        return NamedSharding(mesh, P())
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of [B, ...] arrays with B sharded over ``data``."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x))), batch
    )


def replicate_params(mesh: Mesh, params):
    return jax.device_put(params, replicated(mesh))


def vocab_tp_sharding(mesh: Mesh) -> NamedSharding:
    """Column-parallel sharding for the fc vocab projection [H, V]:
    V split over ``model`` (future TP hook)."""
    return NamedSharding(mesh, P(None, "model"))

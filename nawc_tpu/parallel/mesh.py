"""Device mesh + sharding helpers.

The reference has NO parallelism of any kind (single `device =` everywhere,
SURVEY.md §2.3 nil report); the TPU framework introduces data parallelism
over clips/chunks on a ("data", "model") mesh — ICI within a slice, DCN
across slices — with the model replicated (codec ~20M params fits per chip)
and the RVQ codebook optionally sharded over "model" (see parallel/tp.py).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    """Build a ("data", "model") mesh over available devices."""
    devs = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = max(len(devs) // n_model, 1)
    use = devs[: n_data * n_model]
    arr = np.array(use).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def data_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard the leading (batch) axis over "data"; replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a pytree of (B, ...) arrays with B sharded over "data"."""
    def put(x):
        return jax.device_put(x, data_sharding(mesh, np.ndim(x)))
    return jax.tree_util.tree_map(put, batch)

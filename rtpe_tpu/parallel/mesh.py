"""Mesh construction and sharding helpers.

The reference trains on exactly one GPU (SURVEY.md §2.5); here data
parallelism is first-class: a 1-D ``data`` mesh axis spans all local
devices (ICI within a slice; ``jax.distributed`` extends the same
program over DCN across hosts), batches are sharded over it, parameters
are replicated, and XLA inserts the gradient ``psum``.

A second, currently size-1 ``model`` axis is laid out for future
tensor/spatial sharding of the W48 trunk.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    used = n_data * n_model
    if used < len(devices):
        import warnings
        warnings.warn(
            f"mesh uses {used} of {len(devices)} devices "
            f"(n_data={n_data} x n_model={n_model}); the rest idle",
            stacklevel=2)
    devices = devices[:used]
    arr = np.array(devices).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def shard_batch(batch, mesh: Mesh):
    """Device-put a pytree of (B, ...) arrays sharded over ``data``."""

    def put(x):
        spec = P("data", *([None] * (np.ndim(x) - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    """Device-put a pytree fully replicated over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)

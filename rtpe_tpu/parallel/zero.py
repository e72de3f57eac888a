"""ZeRO-1: shard optimizer state over the data axis (SURVEY.md §2.5).

Under plain data parallelism every device holds a full copy of the
optimizer state (here: SGD momentum buffers, the same size as the
parameters).  ZeRO stage 1 partitions that state across the ``data``
axis so each device stores only ``1/N`` of it; XLA moves the matching
parameter/gradient slices to wherever the update computes and
re-replicates the updated parameters (the jax.sharding analog of the
DeepSpeed/FSDP optimizer-state partitioning — no hand-written
collectives, the GSPMD partitioner inserts them).

Usage::

    state = DistillTrainState.create(variables, cfg)
    state = jax.device_put(state, zero1_state_sharding(state, mesh))
    step  = make_distill_train_step(model, cfg)   # unchanged
    state, metrics = step(state, shard_batch(batch, mesh))

``tests/test_parallel_extra.py`` asserts the sharded run matches the
replicated run exactly and that per-device momentum shards shrink.
"""

from typing import Any

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _leaf_sharding(x, mesh: Mesh, axis: str, min_elems: int) -> NamedSharding:
    """Shard ``x`` over ``axis`` along its first dimension divisible by
    the axis size; tiny or indivisible leaves stay replicated."""
    n = mesh.shape[axis]
    shape = np.shape(x)
    if np.size(x) >= min_elems:
        for d, s in enumerate(shape):
            if s % n == 0 and s > 0:
                spec = [None] * len(shape)
                spec[d] = axis
                return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P())


def zero1_state_sharding(state: Any, mesh: Mesh, axis: str = "data",
                         min_elems: int = 2 ** 12) -> Any:
    """Sharding tree for a train state: optimizer state partitioned over
    ``axis``; params/batch_stats/step replicated.

    Works on any pytree with ``params`` / ``opt_state`` attributes
    (e.g. :class:`rtpe_tpu.train.DistillTrainState`) or dict keys.
    """
    replicated = NamedSharding(mesh, P())

    def for_opt(tree):
        return jax.tree_util.tree_map(
            lambda x: _leaf_sharding(x, mesh, axis, min_elems), tree)

    if hasattr(state, "opt_state"):
        return type(state)(
            **{**{f: jax.tree_util.tree_map(lambda _: replicated,
                                            getattr(state, f))
                  for f in ("step", "params", "batch_stats")},
               "opt_state": for_opt(state.opt_state)})
    raise TypeError(f"unsupported train-state type: {type(state)}")

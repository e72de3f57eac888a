"""Multi-host initialization (DCN) — SURVEY.md §5.8.

The reference has no distributed execution (its only trace is a
commented-out ``DIST_BACKEND: "nccl"`` config).  Here multi-host is the
same pjit program over a larger mesh: call :func:`initialize` once per
host before any jax computation, build the mesh with
:func:`make_multihost_mesh`, and keep the ``data`` axis innermost over
ICI with the ``hosts`` axis over DCN so gradient reductions ride the
fast interconnect first.
"""

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """``jax.distributed.initialize`` from args or the standard env vars
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID); no-op when
    running single-process."""
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return  # single host
    if num_processes is None:
        num_processes = int(os.environ.get("NUM_PROCESSES", 1))
    if process_id is None:  # NOT `or`: an explicit rank 0 must win
        process_id = int(os.environ.get("PROCESS_ID", 0))
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=int(num_processes),
        process_id=int(process_id))


def make_multihost_mesh(n_model: int = 1) -> Mesh:
    """(hosts, data, model) mesh: ``hosts`` spans DCN (one entry per
    process), ``data``×``model`` spans each host's local chips over ICI.
    """
    n_hosts = jax.process_count()
    local = jax.local_device_count()
    n_data = local // n_model
    devices = np.array(jax.devices()).reshape(n_hosts, n_data, n_model)
    return Mesh(devices, axis_names=("hosts", "data", "model"))


def process_local_batch_slice(global_batch: int) -> slice:
    """Each host feeds its shard of the global batch (per-host input
    sharding; SURVEY.md §2.5)."""
    per_host = global_batch // jax.process_count()
    start = jax.process_index() * per_host
    return slice(start, start + per_host)

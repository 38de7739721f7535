"""Multi-host initialization and mesh topology helpers.

Single-host meshes (mesh.py) cover one pod slice's ICI. For multi-host
jobs, `initialize_multihost()` wraps jax.distributed so every host sees the
global device set; `make_multihost_mesh` then lays the `data` axis so that
per-host batch shards stay host-local (collectives ride ICI inside a slice
and only gradient reduction crosses DCN).

The reference has no multi-node story at all (SURVEY §4: nothing exercises
more than one host); this is a capability extension, exercised in
simulation by the virtual-device tests.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).

    Returns True if distributed mode was initialized, False for
    single-process runs (no coordinator configured)."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return False
    # `is None` checks, not `or`: process 0's id is falsy (bug found by
    # the real 2-process test — `0 or env[...]` raised on the coordinator)
    if num_processes is None:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def make_multihost_mesh(n_model: int = 1) -> Mesh:
    """Global ('data', 'model') mesh over all hosts' devices, ordered so
    consecutive data-axis entries are co-located per host (batch shards are
    host-local; DCN only carries the gradient all-reduce)."""
    devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n = len(devices)
    if n % n_model != 0:
        raise ValueError(f"{n} devices not divisible by model axis {n_model}")
    arr = np.asarray(devices).reshape(n // n_model, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def local_batch_slice(global_batch: int) -> slice:
    """This host's slice of a globally-sharded batch (for per-host loaders
    feeding jax.make_array_from_process_local_data)."""
    per_host = global_batch // jax.process_count()
    start = jax.process_index() * per_host
    return slice(start, start + per_host)

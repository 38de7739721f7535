"""Mesh construction and sharding rules.

Design (per the scaling-book recipe): pick a mesh, annotate shardings on
inputs/params, let XLA insert collectives.

- `data` axis: batch dimension of every batch array — replaces
  DataParallel's scatter/gather; the gradient all-reduce rides ICI.
- `model` axis: optional tensor parallelism for the widest matmuls — the
  (D, 4H) / (H, 4H) LSTM kernels and the (in, out) MCB/DFT projections are
  sharded on their output column dimension; everything else is replicated.
  At the reference's sizes (H=1024) TP is optional headroom, but the
  machinery is first-class so larger configs shard without code changes.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int = -1, n_model: int = 1,
              devices: Optional[list] = None) -> Mesh:
    """Mesh with ('data', 'model') axes over the available devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_data == -1:
        n_data = n // n_model
    if n_data * n_model != n:
        raise ValueError(f"mesh {n_data}x{n_model} != {n} devices")
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) over `data`."""
    return NamedSharding(mesh, P("data"))


def shard_batch(mesh: Mesh, batch):
    """device_put a Batch (or any pytree of arrays) with batch-dim sharding.

    None leaves pass through (unused modalities)."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda a: a if a is None else jax.device_put(a, sh), batch
    )


# --- parameter sharding -----------------------------------------------------

_TP_MIN_COLS = 2048  # only shard matrices at least this wide


def param_sharding_rules(path: tuple, value) -> P:
    """PartitionSpec for one parameter leaf.

    Wide recurrent/projection kernels get their output dimension sharded on
    `model`; small params are replicated. Keys arrive as flax path tuples.
    """
    names = [getattr(p, "key", str(p)) for p in path]
    leaf = names[-1] if names else ""
    if (
        value.ndim == 2
        and leaf in ("w_ih", "w_hh")
        and value.shape[-1] >= _TP_MIN_COLS
    ):
        return P(None, "model")
    return P()


def shard_params(mesh: Mesh, variables):
    """device_put a variables pytree with param_sharding_rules applied."""

    def put(path, value):
        spec = param_sharding_rules(path, value)
        return jax.device_put(value, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, variables)


def sharding_tree(mesh: Mesh, variables):
    """The NamedSharding pytree matching shard_params (for jit in/out specs)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, value: NamedSharding(mesh, param_sharding_rules(path, value)),
        variables,
    )


def shard_opt_state(mesh: Mesh, opt_state):
    """device_put optimizer state with moments placed like their params.

    Adam's `mu`/`nu` subtrees mirror the param tree, so each moment leaf's
    path ends in the same key names (`w_ih`, `w_hh`, ...) that
    `param_sharding_rules` dispatches on — applying the rules to the
    opt-state paths directly places every moment with the same PartitionSpec
    as its parameter (scalars like `count` fall through to replicated).
    """

    def put(path, value):
        spec = param_sharding_rules(path, value)
        return jax.device_put(value, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, opt_state)


def opt_sharding_tree(mesh: Mesh, opt_state):
    """The NamedSharding pytree matching shard_opt_state (for jit specs)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, value: NamedSharding(mesh, param_sharding_rules(path, value)),
        opt_state,
    )

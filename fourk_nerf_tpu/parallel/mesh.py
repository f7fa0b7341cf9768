"""Mesh construction and sharding rules.

Replaces the reference's (unused) NCCL process-group machinery
(/root/reference/torch_utils/distributed_utils.py:31-191) with the JAX-native
equivalents: a single :class:`jax.sharding.Mesh` whose axes are

- ``data``  -- ray/pixel batches (DP; grads reduced by XLA via sharding
  propagation, replacing ``all_reduce``),
- ``grid``  -- spatial sharding of the voxel volume along X (TP analogue;
  XLA inserts halo/all-gather collectives for trilinear reads across
  boundaries).

Multi-host runs use the same primitives over DCN; call
``jax.distributed.initialize`` before :func:`make_mesh` there.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_grid: int = 1, devices=None) -> Mesh:
    """Mesh over ``n_data x n_grid`` devices (defaults to all devices on the
    data axis)."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_grid
    assert n_data * n_grid <= len(devices), (n_data, n_grid, len(devices))
    arr = np.asarray(devices[: n_data * n_grid]).reshape(n_data, n_grid)
    return Mesh(arr, axis_names=("data", "grid"))


def shard_batch(mesh: Mesh) -> NamedSharding:
    """Rays/pixels sharded along the leading axis (DP)."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def grid_sharding(mesh: Mesh) -> NamedSharding:
    """Voxel grids [X, Y, Z, C] sharded along X over the 'grid' axis."""
    return NamedSharding(mesh, P("grid", None, None, None))


def shard_grid_params(mesh: Mesh, params: dict) -> dict:
    """Place model params: voxel grids sharded along X, everything else
    replicated."""
    gs = grid_sharding(mesh)
    rep = replicate(mesh)

    def place(path_leaf):
        name, leaf = path_leaf
        if name in ("density", "k0") and getattr(leaf, "ndim", 0) == 4:
            return jax.device_put(leaf, gs)
        return jax.tree.map(lambda x: jax.device_put(x, rep), leaf)

    return {k: place((k, v)) for k, v in params.items()}


def all_reduce_dict(mesh: Mesh, d: dict) -> dict:
    """Mean-reduce scalar metrics across the data axis (replaces
    ``distributed_utils.all_reduce_dict``). Under jit+sharding this is a
    no-op wrapper since values are already replicated; kept for API parity."""
    return d


def is_master() -> bool:
    """True on process 0 (multi-host); reference ``get_rank()==0`` helper."""
    return jax.process_index() == 0

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


def all_reduce_dict(mesh: Mesh, d: dict, axis: str = "data") -> dict:
    """Mean-reduce a dict of per-device metric values across ``axis``
    (replaces ``distributed_utils.all_reduce_dict``,
    /root/reference/torch_utils/distributed_utils.py:143-191).

    Leaves may be host scalars (treated as already replicated) or arrays
    whose leading dim equals the axis size (one value per device, e.g. a
    per-shard loss). Returns replicated device scalars (the mean)."""
    import jax.numpy as jnp
    from jax import shard_map  # jax>=0.4.35 top-level API

    n = mesh.shape[axis]

    def prep(x):
        x = jnp.asarray(x, jnp.float32)
        if x.ndim == 0:
            x = jnp.broadcast_to(x, (n,))
        return jax.device_put(x, NamedSharding(mesh, P(axis)))

    def _reduce(tree):
        return jax.tree.map(lambda v: jax.lax.pmean(jnp.mean(v), axis), tree)

    fn = shard_map(_reduce, mesh=mesh, in_specs=P(axis), out_specs=P())
    with mesh:
        return fn(jax.tree.map(prep, d))


def maybe_initialize_distributed(enable: bool = False, **kwargs) -> bool:
    """Multi-host wiring: call ``jax.distributed.initialize`` once when
    requested (CLI ``--multihost`` or coordinator env vars present). The
    same Mesh/collective code then spans hosts over DCN -- this replaces the
    reference's ``init_distributed_mode`` NCCL setup
    (/root/reference/torch_utils/distributed_utils.py:31-62)."""
    import os

    want = enable or bool(os.environ.get("JAX_COORDINATOR_ADDRESS")
                          or os.environ.get("COORDINATOR_ADDRESS"))
    if not want:
        return False
    # NOTE: must not call jax.process_count()/jax.devices() here -- that
    # initializes the backend and makes a later distributed.initialize
    # impossible. Probe the (private) distributed client state when
    # available; if that private API moves in a future JAX, fall through
    # and let initialize() itself report "already initialized".
    try:
        from jax._src import distributed as _dist

        if getattr(_dist.global_state, "client", None) is not None:
            return True  # already initialized
    except Exception:
        pass
    try:
        jax.distributed.initialize(**kwargs)
        print(f"jax.distributed initialized: process {jax.process_index()}"
              f"/{jax.process_count()}")
        return True
    except RuntimeError as e:
        if "already" in str(e).lower():
            return True
        print(f"maybe_initialize_distributed: initialize failed ({e}); "
              "continuing single-process")
        return False
    except Exception as e:
        print(f"maybe_initialize_distributed: initialize failed ({e}); "
              "continuing single-process")
        return False


def is_master() -> bool:
    """True on process 0 (multi-host); reference ``get_rank()==0`` helper."""
    return jax.process_index() == 0

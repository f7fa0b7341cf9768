"""Shared building blocks for the voxel radiance-field models.

Models are (static config, params pytree, buffers pytree) triples with pure
``forward`` functions -- the functional JAX equivalent of the reference's
``nn.Module`` classes. Param layouts are channel-last for TPU lanes.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Shallow MLP (the rgbnet). Matches torch nn.Linear default init:
# W, b ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)); final bias zeroed
# (/root/reference/lib/dmpigo.py:112-120).
# ---------------------------------------------------------------------------

def mlp_init(key: jax.Array, dims: Sequence[int], zero_final_bias: bool = True) -> dict:
    params = {}
    n_layers = len(dims) - 1
    for li in range(n_layers):
        key, kw, kb = jax.random.split(key, 3)
        fan_in = dims[li]
        bound = 1.0 / math.sqrt(fan_in)
        params[f"w{li}"] = jax.random.uniform(
            kw, (dims[li], dims[li + 1]), minval=-bound, maxval=bound, dtype=jnp.float32
        )
        if zero_final_bias and li == n_layers - 1:
            params[f"b{li}"] = jnp.zeros((dims[li + 1],), dtype=jnp.float32)
        else:
            params[f"b{li}"] = jax.random.uniform(
                kb, (dims[li + 1],), minval=-bound, maxval=bound, dtype=jnp.float32
            )
    return params


def activation(name: str):
    if name == "relu":
        return jax.nn.relu
    if name == "lkrelu":
        return lambda x: jax.nn.leaky_relu(x, 0.01)
    if name == "gauss":
        # GaussianActivation(a=0.05) (/root/reference/lib/act.py)
        return lambda x: jnp.exp(-(x**2) / (2.0 * 0.05**2))
    raise NotImplementedError(name)


def mlp_apply(params: dict, x: jax.Array, act) -> jax.Array:
    n_layers = len(params) // 2
    for li in range(n_layers):
        x = x @ params[f"w{li}"] + params[f"b{li}"]
        if li < n_layers - 1:
            x = act(x)
    return x


def mlp_num_layers(params: dict) -> int:
    return len(params) // 2


# ---------------------------------------------------------------------------
# Grid-resolution math (mirrors _set_grid_resolution in the reference models)
# ---------------------------------------------------------------------------

def dvgo_grid_resolution(xyz_min, xyz_max, num_voxels: int):
    """Cubic-voxel world size for bounded scenes (/root/reference/lib/dvgo.py:152-162)."""
    xyz_min = np.asarray(xyz_min, dtype=np.float64)
    xyz_max = np.asarray(xyz_max, dtype=np.float64)
    voxel_size = (np.prod(xyz_max - xyz_min) / num_voxels) ** (1.0 / 3.0)
    world_size = ((xyz_max - xyz_min) / voxel_size).astype(np.int64)
    return tuple(int(w) for w in world_size), float(voxel_size)


def dmpigo_grid_resolution(xyz_min, xyz_max, num_voxels: int, mpi_depth: int):
    """MPI world size: XY from the voxel budget, Z = mpi_depth
    (/root/reference/lib/dmpigo.py:156-166)."""
    xyz_min = np.asarray(xyz_min, dtype=np.float64)
    xyz_max = np.asarray(xyz_max, dtype=np.float64)
    xy_len = xyz_max[:2] - xyz_min[:2]
    r = math.sqrt(num_voxels / mpi_depth / float(np.prod(xy_len)))
    world_size = (int(xy_len[0] * r), int(xy_len[1] * r), int(mpi_depth))
    return world_size


def mpi_act_shift(mpi_depth: int, voxel_size_ratio: float) -> np.ndarray:
    """Per-plane density bias so every plane starts with equal alpha
    (/root/reference/lib/dmpigo.py:48-58)."""
    g = np.full([mpi_depth], 1.0 / mpi_depth - 1e-6)
    p = [1 - g[0]]
    for i in range(1, len(g)):
        p.append((1 - g[: i + 1].sum()) / (1 - g[:i].sum()))
    shift = np.array([np.log(pi ** (-1.0 / voxel_size_ratio) - 1.0) for pi in p], dtype=np.float32)
    return shift


# ---------------------------------------------------------------------------
# Grid-type dispatch (DenseGrid | TensoRFGrid), mirroring create_grid
# (/root/reference/lib/grid.py:27-35). Grid params are either a raw
# channel-last array (dense) or a TensoRF factor pytree.
# ---------------------------------------------------------------------------

def grid_init(grid_type: str, key: jax.Array, channels: int, world_size,
              config: tuple = ()):
    if grid_type == "DenseGrid":
        X, Y, Z = world_size
        return jnp.zeros((X, Y, Z, channels), dtype=jnp.float32)
    if grid_type == "TensoRFGrid":
        from fourk_nerf_tpu.ops import tensorf

        cfgd = dict(config)
        return tensorf.init_tensorf(
            key, channels, world_size, n_comp=cfgd["n_comp"],
            n_comp_xy=cfgd.get("n_comp_xy"),
        )
    raise NotImplementedError(grid_type)


def grid_query(grid_type: str, gparams, ind01):
    if grid_type == "DenseGrid":
        from fourk_nerf_tpu.ops import grid_sample

        return grid_sample.trilinear_sample(gparams, ind01)
    if grid_type == "TensoRFGrid":
        from fourk_nerf_tpu.ops import tensorf

        return tensorf.tensorf_query(gparams, ind01)
    raise NotImplementedError(grid_type)


def grid_resize(grid_type: str, gparams, new_size):
    if grid_type == "DenseGrid":
        from fourk_nerf_tpu.ops import grid_sample

        # slab-chunked + jitted: the pg_scale upsample to the full fern
        # grid (37.7M query points x 9 ch) dispatched eagerly materializes
        # ~11 GB of 8-corner temporaries and RESOURCE_EXHAUSTEDs a 16 GB
        # chip mid-training (hit at the iter-8000 boundary of the round-5
        # long slice, with optimizer state resident)
        return grid_sample.resize_trilinear_chunked(gparams, new_size)
    if grid_type == "TensoRFGrid":
        from fourk_nerf_tpu.ops import tensorf

        return tensorf.tensorf_resize(gparams, new_size)
    raise NotImplementedError(grid_type)


def grid_dense(grid_type: str, gparams, channels: int):
    if grid_type == "DenseGrid":
        return gparams
    if grid_type == "TensoRFGrid":
        from fourk_nerf_tpu.ops import tensorf

        return tensorf.tensorf_dense(gparams, channels)
    raise NotImplementedError(grid_type)


# ---------------------------------------------------------------------------
# Pytree (de)serialization helpers for checkpoints
# ---------------------------------------------------------------------------

def tree_to_flat_dict(tree: Any, prefix: str = "") -> dict:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(tree_to_flat_dict(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def flat_dict_to_tree(flat: dict) -> dict:
    tree: dict = {}
    for path, v in flat.items():
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return tree

"""Trilinear / nearest voxel-grid sampling, TPU-native.

Replaces the reference's cuDNN ``F.grid_sample`` (/root/reference/lib/grid.py:124,
align_corners=True, zeros padding) and the ``maskcache_lookup`` CUDA kernel
(/root/reference/lib/cuda/render_utils_kernel.cu:367-424) with gather-based JAX
that XLA fuses into the surrounding render computation. Grids are stored
channel-last ``[X, Y, Z, C]`` so the channel dim rides the TPU lane dimension.

Coordinate convention: align_corners=True, i.e. a normalized coordinate
``u in [0, 1]`` maps to voxel index ``u * (size - 1)``. This matches the
reference's ``ind_norm = norm01 * 2 - 1`` + grid_sample(align_corners=True).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def world_to_ind01(xyz, xyz_min, xyz_max):
    """Map world coordinates to [0,1]^3 normalized grid coordinates."""
    return (xyz - xyz_min) / (xyz_max - xyz_min)


def trilinear_sample(grid, ind01):
    """Trilinearly sample a voxel grid with zeros padding.

    Args:
      grid: ``[X, Y, Z, C]`` voxel grid.
      ind01: ``[..., 3]`` normalized coordinates (0..1 inside the grid).
        Out-of-range queries get zero contribution from out-of-range corners,
        matching ``F.grid_sample(padding_mode='zeros', align_corners=True)``.

    Returns:
      ``[..., C]`` interpolated features.
    """
    X, Y, Z, C = grid.shape
    size = jnp.array([X, Y, Z], dtype=ind01.dtype)
    pos = ind01 * (size - 1)  # align_corners=True
    batch_shape = pos.shape[:-1]
    pos = pos.reshape(-1, 3)

    i0 = jnp.floor(pos)
    frac = pos - i0
    i0 = i0.astype(jnp.int32)

    flat_grid = grid.reshape(-1, C)
    out = jnp.zeros((pos.shape[0], C), dtype=grid.dtype)
    sizes = jnp.array([X, Y, Z], dtype=jnp.int32)
    for cx in (0, 1):
        for cy in (0, 1):
            for cz in (0, 1):
                corner = jnp.array([cx, cy, cz], dtype=jnp.int32)
                idx = i0 + corner  # [M, 3]
                valid = jnp.all((idx >= 0) & (idx < sizes), axis=-1)
                w = jnp.prod(
                    jnp.where(corner == 1, frac, 1.0 - frac), axis=-1
                )
                cidx = jnp.clip(idx, 0, sizes - 1)
                flat_idx = (cidx[:, 0] * Y + cidx[:, 1]) * Z + cidx[:, 2]
                vals = jnp.take(flat_grid, flat_idx, axis=0)
                out = out + jnp.where(valid, w, 0.0)[:, None] * vals

    return out.reshape(*batch_shape, C)


def trilinear_sample_plane_aligned(grid, ind01_xy, valid_z=None):
    """Trilinear sampling specialized for the MPI geometry where sample k of
    every ray lies EXACTLY on grid depth-plane k.

    In LLFF NDC every ray has o_z = -1 and d_z = 2 by construction
    (ops/rays.py ndc_rays), the scene bbox spans z in [-1, 1], and with
    stepsize=1 the sample count equals ``mpi_depth`` -- so the z interpolation
    weight degenerates to exact plane indexing and the 8-corner trilinear
    gather becomes a 4-corner bilinear gather on plane k (half the HBM
    traffic of the general path, identical results).

    Args:
      grid: ``[X, Y, Z, C]`` with Z == K.
      ind01_xy: ``[N, K, 2]`` normalized xy coordinates (sample k uses plane k).

    Returns ``[N, K, C]``.
    """
    X, Y, Z, C = grid.shape
    N, K, _ = ind01_xy.shape
    assert K == Z, (K, Z)
    size = jnp.array([X, Y], dtype=ind01_xy.dtype)
    pos = ind01_xy * (size - 1)
    i0 = jnp.floor(pos)
    frac = pos - i0
    i0 = i0.astype(jnp.int32)

    plane_k = jax.lax.broadcasted_iota(jnp.int32, (N, K), 1)
    flat_grid = grid.reshape(-1, C)
    sizes = jnp.array([X, Y], dtype=jnp.int32)
    out = jnp.zeros((N, K, C), dtype=grid.dtype)
    for cx in (0, 1):
        for cy in (0, 1):
            corner = jnp.array([cx, cy], dtype=jnp.int32)
            idx = i0 + corner  # [N,K,2]
            valid = jnp.all((idx >= 0) & (idx < sizes), axis=-1)
            w = jnp.prod(jnp.where(corner == 1, frac, 1.0 - frac), axis=-1)
            cidx = jnp.clip(idx, 0, sizes - 1)
            flat_idx = (cidx[..., 0] * Y + cidx[..., 1]) * Z + plane_k
            vals = jnp.take(flat_grid, flat_idx.reshape(-1), axis=0).reshape(N, K, C)
            out = out + jnp.where(valid, w, 0.0)[..., None] * vals
    return out


def grid_query(grid, xyz, xyz_min, xyz_max):
    """Query a world-space voxel grid: ``DenseGrid.forward`` equivalent
    (/root/reference/lib/grid.py:117-128). Returns ``[..., C]`` (``[...]`` when C==1
    is the caller's concern)."""
    return trilinear_sample(grid, world_to_ind01(xyz, xyz_min, xyz_max))


def nearest_mask_lookup(mask, xyz, xyz_min, xyz_max):
    """Nearest-neighbor boolean occupancy lookup; False outside the grid.

    Matches ``maskcache_lookup_cuda``: ``ijk = round(xyz * scale + shift)``
    with ``scale = (shape-1)/(max-min)``, ``shift = -min*scale``
    (/root/reference/lib/grid.py:290-304, render_utils_kernel.cu:373-392).

    Args:
      mask: ``[X, Y, Z]`` bool occupancy grid.
      xyz: ``[..., 3]`` world coordinates.
    """
    X, Y, Z = mask.shape
    sizes = jnp.array([X, Y, Z], dtype=xyz.dtype)
    scale = (sizes - 1) / (xyz_max - xyz_min)
    ijk = jnp.round(xyz * scale + (-xyz_min * scale)).astype(jnp.int32)
    in_range = jnp.all((ijk >= 0) & (ijk < sizes.astype(jnp.int32)), axis=-1)
    cijk = jnp.clip(ijk, 0, sizes.astype(jnp.int32) - 1)
    flat_idx = (cijk[..., 0] * Y + cijk[..., 1]) * Z + cijk[..., 2]
    vals = jnp.take(mask.reshape(-1), flat_idx.reshape(-1), axis=0).reshape(flat_idx.shape)
    return vals & in_range


def resize_trilinear(grid, new_size):
    """Trilinear align_corners=True resize of ``[X, Y, Z, C]`` to ``new_size``.

    Equivalent to ``F.interpolate(mode='trilinear', align_corners=True)`` used
    by progressive scaling (/root/reference/lib/grid.py:130-135). ``jax.image.resize``
    uses half-pixel centers (align_corners=False), so we sample explicitly.
    """
    nx, ny, nz = (int(s) for s in new_size)
    u = [
        (jnp.arange(n, dtype=grid.dtype) / (n - 1) if n > 1 else jnp.zeros(n, dtype=grid.dtype))
        for n in (nx, ny, nz)
    ]
    gx, gy, gz = jnp.meshgrid(u[0], u[1], u[2], indexing="ij")
    ind01 = jnp.stack([gx, gy, gz], axis=-1)
    return trilinear_sample(grid, ind01)


def resize_trilinear_chunked(grid, new_size, z_chunk: int = 32):
    """Memory-bounded, jitted variant of :func:`resize_trilinear`.

    Computes the output in z-slabs of ``z_chunk`` planes, each under one jit
    (one compile serves all slabs: the slab origin is a traced scalar).  A
    fern-scale upsample (384x384x256 target, 37.7M query points) dispatched
    eagerly OOMs a 16 GB chip because every 8-corner temporary materializes;
    slab-wise jit bounds the peak to one slab's worth of temporaries.

    Same semantics as the reference's progressive-scaling resize
    (/root/reference/lib/grid.py:130-135, align_corners=True).
    """
    nx, ny, nz = (int(s) for s in new_size)
    dt = grid.dtype

    def axis_u(n):
        return (jnp.arange(n, dtype=dt) / (n - 1) if n > 1
                else jnp.zeros(n, dtype=dt))

    ux, uy = axis_u(nx), axis_u(ny)

    @jax.jit
    def sample_slab(grid, z0):
        uz = (z0 + jnp.arange(z_chunk, dtype=dt)) / max(nz - 1, 1)
        gx, gy, gz = jnp.meshgrid(ux, uy, uz, indexing="ij")
        return trilinear_sample(grid, jnp.stack([gx, gy, gz], axis=-1))

    slabs = [sample_slab(grid, jnp.asarray(z0, dt))
             for z0 in range(0, nz, z_chunk)]
    return jnp.concatenate(slabs, axis=2)[:, :, :nz]


def max_pool3d_same(x):
    """3x3x3 max pool, stride 1, 'same' padding over ``[X, Y, Z]``.

    Equivalent to ``F.max_pool3d(kernel_size=3, padding=1, stride=1)`` used to
    dilate occupancy before thresholding (/root/reference/lib/dvgo.py:216-232).
    """
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(3, 3, 3),
        window_strides=(1, 1, 1),
        padding="SAME",
    )

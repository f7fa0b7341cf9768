"""TensoRF vector-matrix decomposed grid (TPU-native).

Rebuild of the reference ``TensoRFGrid`` (/root/reference/lib/grid.py:157-268):
a 3D field factorized as three plane-vector products
``xy*z + xz*y + yz*x`` with an optional per-channel fusion matrix. Queries
are three bilinear 2D samples + three linear 1D samples + one small matmul
(MXU-friendly). Params are channel-last pytrees.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def bilinear_sample(plane, uv01):
    """Bilinearly sample ``[H, W, C]`` at normalized ``[..., 2]`` coords
    (align_corners=True, zeros padding)."""
    H, W, C = plane.shape
    size = jnp.array([H, W], dtype=uv01.dtype)
    pos = uv01 * (size - 1)
    batch = pos.shape[:-1]
    pos = pos.reshape(-1, 2)
    i0 = jnp.floor(pos)
    frac = pos - i0
    i0 = i0.astype(jnp.int32)
    flat = plane.reshape(-1, C)
    sizes = jnp.array([H, W], dtype=jnp.int32)
    out = jnp.zeros((pos.shape[0], C), dtype=plane.dtype)
    for cy in (0, 1):
        for cx in (0, 1):
            corner = jnp.array([cy, cx], dtype=jnp.int32)
            idx = i0 + corner
            valid = jnp.all((idx >= 0) & (idx < sizes), axis=-1)
            w = jnp.prod(jnp.where(corner == 1, frac, 1.0 - frac), axis=-1)
            cidx = jnp.clip(idx, 0, sizes - 1)
            vals = jnp.take(flat, cidx[:, 0] * W + cidx[:, 1], axis=0)
            out = out + jnp.where(valid, w, 0.0)[:, None] * vals
    return out.reshape(*batch, C)


def linear_sample(vec, u01):
    """Linearly sample ``[L, C]`` at normalized ``[...]`` coords."""
    return bilinear_sample(vec[:, None, :], jnp.stack([u01, jnp.zeros_like(u01)], -1))


def init_tensorf(key, channels: int, world_size, n_comp: int, n_comp_xy: int | None = None):
    """Parameter pytree: planes ``[A, B, R]``, vectors ``[L, R]``, fusion
    ``[R_total, C]`` (kaiming-uniform like the reference's f_vec init)."""
    X, Y, Z = world_size
    R = n_comp
    Rxy = n_comp_xy if n_comp_xy is not None else R
    keys = jax.random.split(key, 7)
    params = {
        "xy_plane": 0.1 * jax.random.normal(keys[0], (X, Y, Rxy)),
        "xz_plane": 0.1 * jax.random.normal(keys[1], (X, Z, R)),
        "yz_plane": 0.1 * jax.random.normal(keys[2], (Y, Z, R)),
        "x_vec": 0.1 * jax.random.normal(keys[3], (X, R)),
        "y_vec": 0.1 * jax.random.normal(keys[4], (Y, R)),
        "z_vec": 0.1 * jax.random.normal(keys[5], (Z, Rxy)),
    }
    if channels > 1:
        bound = math.sqrt(6.0 / ((1 + 5) * (R + R + Rxy)))
        params["f_vec"] = jax.random.uniform(
            keys[6], (R + R + Rxy, channels), minval=-bound, maxval=bound
        )
    return params


def tensorf_query(params: dict, ind01):
    """Query at normalized [...,3] coords; returns [...,C] (C=1 when no
    fusion matrix, matching compute_tensorf_val, lib/grid.py:258-268)."""
    x, y, z = ind01[..., 0], ind01[..., 1], ind01[..., 2]
    xy = bilinear_sample(params["xy_plane"], jnp.stack([x, y], -1))
    xz = bilinear_sample(params["xz_plane"], jnp.stack([x, z], -1))
    yz = bilinear_sample(params["yz_plane"], jnp.stack([y, z], -1))
    xv = linear_sample(params["x_vec"], x)
    yv = linear_sample(params["y_vec"], y)
    zv = linear_sample(params["z_vec"], z)
    if "f_vec" in params:
        feat = jnp.concatenate([xy * zv, xz * yv, yz * xv], axis=-1)
        return feat @ params["f_vec"]
    val = (xy * zv).sum(-1) + (xz * yv).sum(-1) + (yz * xv).sum(-1)
    return val[..., None]


def tensorf_resize(params: dict, new_size):
    """Bilinear align-corners resize of every factor (lib/grid.py:198-207)."""
    from fourk_nerf_tpu.ops.grid_sample import resize_trilinear

    X, Y, Z = (int(s) for s in new_size)

    def resize2d(p, h, w):
        # [H,W,C] -> treat as [H,W,1,C] volume and resize two axes
        return resize_trilinear(p[:, :, None, :], (h, w, 1))[:, :, 0, :]

    out = dict(params)
    out["xy_plane"] = resize2d(params["xy_plane"], X, Y)
    out["xz_plane"] = resize2d(params["xz_plane"], X, Z)
    out["yz_plane"] = resize2d(params["yz_plane"], Y, Z)
    out["x_vec"] = resize2d(params["x_vec"][:, None, :], X, 1)[:, 0, :]
    out["y_vec"] = resize2d(params["y_vec"][:, None, :], Y, 1)[:, 0, :]
    out["z_vec"] = resize2d(params["z_vec"][:, None, :], Z, 1)[:, 0, :]
    return out


def tensorf_dense(params: dict, channels: int):
    """Materialize the dense [X,Y,Z,C] grid (lib/grid.py:223-236)."""
    xy, xz, yz = params["xy_plane"], params["xz_plane"], params["yz_plane"]
    xv, yv, zv = params["x_vec"], params["y_vec"], params["z_vec"]
    if channels > 1:
        feat = jnp.concatenate([
            jnp.einsum("xyr,zr->xyzr", xy, zv),
            jnp.einsum("xzr,yr->xyzr", xz, yv),
            jnp.einsum("yzr,xr->xyzr", yz, xv),
        ], axis=-1)
        return jnp.einsum("xyzr,rc->xyzc", feat, params["f_vec"])
    dense = (
        jnp.einsum("xyr,zr->xyz", xy, zv)
        + jnp.einsum("xzr,yr->xyz", xz, yv)
        + jnp.einsum("yzr,xr->xyz", yz, xv)
    )
    return dense[..., None]


def tensorf_tv_loss(params: dict, wx: float, wy: float, wz: float):
    """Smooth-L1 total variation over factors (lib/grid.py:209-221); autodiff
    this loss instead of injecting grads."""

    def sl1(a, b):
        d = a - b
        return jnp.sum(jnp.where(jnp.abs(d) < 1, 0.5 * d * d, jnp.abs(d) - 0.5))

    p = params
    loss = (
        wx * sl1(p["xy_plane"][1:], p["xy_plane"][:-1])
        + wy * sl1(p["xy_plane"][:, 1:], p["xy_plane"][:, :-1])
        + wx * sl1(p["xz_plane"][1:], p["xz_plane"][:-1])
        + wz * sl1(p["xz_plane"][:, 1:], p["xz_plane"][:, :-1])
        + wy * sl1(p["yz_plane"][1:], p["yz_plane"][:-1])
        + wz * sl1(p["yz_plane"][:, 1:], p["yz_plane"][:, :-1])
        + wx * sl1(p["x_vec"][1:], p["x_vec"][:-1])
        + wy * sl1(p["y_vec"][1:], p["y_vec"][:-1])
        + wz * sl1(p["z_vec"][1:], p["z_vec"][:-1])
    )
    return loss / 6.0

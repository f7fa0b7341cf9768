"""DirectBiVoxGO: foreground + inverted-sphere-background dual-grid model.

TPU-native rebuild of /root/reference/lib/dbvgo.py (dormant in the reference:
no driver imports it, kept for capability parity). Two independent voxel
fields share one [-1,1]^3 cube: the foreground samples the normalized scene
directly; the background samples along the ray beyond the cube, warped by the
inverted-sphere mapping of ``sample_bg_pts_on_rays``
(render_utils_kernel.cu:300-360). Composite: fg over bg over constant bg
color.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from fourk_nerf_tpu.models import common
from fourk_nerf_tpu.ops import grid_sample, render, rays as ray_ops


@dataclasses.dataclass(frozen=True)
class Config:
    scene_center: tuple
    scene_radius: tuple
    num_voxels: int
    num_voxels_base: int
    world_size: tuple
    mask_cache_world_size: tuple
    voxel_size: float
    voxel_size_base: float
    alpha_init: float
    bg_preserve: float = 0.5
    fast_color_thres: float = 0.0
    density_type: str = "DenseGrid"
    k0_type: str = "DenseGrid"
    density_config: tuple = ()
    k0_config: tuple = ()
    rgbnet_dim: int = 0
    bg_use_mlp: bool = True
    rgbnet_depth: int = 3
    rgbnet_width: int = 128
    viewbase_pe: int = 4

    @property
    def xyz_min(self) -> tuple:
        return (-1.0, -1.0, -1.0)

    @property
    def xyz_max(self) -> tuple:
        return (1.0, 1.0, 1.0)

    @property
    def voxel_size_ratio(self) -> float:
        return self.voxel_size / self.voxel_size_base

    @property
    def k0_dim(self) -> int:
        return 3 if self.rgbnet_dim <= 0 else self.rgbnet_dim

    @property
    def act_shift(self) -> float:
        return float(np.log(1.0 / (1.0 - self.alpha_init) - 1.0))

    def n_samples_fg(self, stepsize: float) -> int:
        stepdist = stepsize * self.voxel_size
        return int(2.0 * np.sqrt(3.0) / stepdist) + 1

    def n_samples_bg(self, stepsize: float) -> int:
        stepdist = stepsize * self.voxel_size
        return int(np.sqrt(3.0) / stepdist * (1.0 - self.bg_preserve)) + 1


def make_config(xyz_min, xyz_max, num_voxels, num_voxels_base, alpha_init,
                mask_cache_world_size=None, **kwargs) -> Config:
    xyz_min = np.asarray(xyz_min, dtype=np.float64)
    xyz_max = np.asarray(xyz_max, dtype=np.float64)
    cube = np.array([2.0, 2.0, 2.0])
    voxel_size = float((np.prod(cube) / num_voxels) ** (1.0 / 3.0))
    voxel_size_base = float((np.prod(cube) / num_voxels_base) ** (1.0 / 3.0))
    world_size = tuple(int(v) for v in (cube / voxel_size).astype(np.int64))
    if mask_cache_world_size is None:
        mask_cache_world_size = world_size
    known = {f.name for f in dataclasses.fields(Config)}
    derived = {"scene_center", "scene_radius", "num_voxels", "num_voxels_base",
               "world_size", "mask_cache_world_size", "voxel_size",
               "voxel_size_base", "alpha_init", "voxel_size_ratio"}
    extra = {k: v for k, v in kwargs.items() if k in known - derived}
    for gk in ("density_config", "k0_config"):
        if isinstance(extra.get(gk), dict):
            extra[gk] = tuple(sorted(extra[gk].items()))
    return Config(
        scene_center=tuple(((xyz_min + xyz_max) * 0.5).tolist()),
        scene_radius=tuple(((xyz_max - xyz_min) * 0.5).tolist()),
        num_voxels=int(num_voxels), num_voxels_base=int(num_voxels_base),
        world_size=world_size,
        mask_cache_world_size=tuple(int(v) for v in mask_cache_world_size),
        voxel_size=voxel_size, voxel_size_base=voxel_size_base,
        alpha_init=float(alpha_init), **extra,
    )


def get_kwargs(cfg: Config) -> dict:
    c, r = np.asarray(cfg.scene_center), np.asarray(cfg.scene_radius)
    return {
        "xyz_min": (c - r).tolist(), "xyz_max": (c + r).tolist(),
        "num_voxels": cfg.num_voxels, "num_voxels_base": cfg.num_voxels_base,
        "alpha_init": cfg.alpha_init, "voxel_size_ratio": cfg.voxel_size_ratio,
        "mask_cache_world_size": list(cfg.mask_cache_world_size),
        "fast_color_thres": cfg.fast_color_thres, "bg_preserve": cfg.bg_preserve,
        "density_type": cfg.density_type, "k0_type": cfg.k0_type,
        "density_config": dict(cfg.density_config), "k0_config": dict(cfg.k0_config),
        "rgbnet_dim": cfg.rgbnet_dim, "bg_use_mlp": cfg.bg_use_mlp,
        "rgbnet_depth": cfg.rgbnet_depth, "rgbnet_width": cfg.rgbnet_width,
        "viewbase_pe": cfg.viewbase_pe,
    }


def init(cfg: Config, key: jax.Array):
    """Two of everything: params['fg'] / params['bg'] subtrees."""
    X, Y, Z = cfg.world_size
    keys = jax.random.split(key, 4)
    dim0 = 3 + 3 * cfg.viewbase_pe * 2 + cfg.k0_dim
    dims = [dim0] + [cfg.rgbnet_width] * (cfg.rgbnet_depth - 1) + [3]

    def field(k, with_mlp, k0_ch):
        kd, kk = jax.random.split(k)
        p = {
            "density": common.grid_init(cfg.density_type, kd, 1, cfg.world_size,
                                        cfg.density_config),
            "k0": common.grid_init(cfg.k0_type, kk, k0_ch, cfg.world_size,
                                   cfg.k0_config),
        }
        if cfg.rgbnet_dim > 0 and with_mlp:
            p["rgbnet"] = common.mlp_init(k, dims)
        return p

    params = {
        "fg": field(keys[0], True, cfg.k0_dim),
        "bg": field(keys[1], cfg.bg_use_mlp, cfg.k0_dim if cfg.bg_use_mlp else 3),
    }
    buffers = {
        "mask_cache_fg": jnp.ones(cfg.mask_cache_world_size, dtype=bool),
        "mask_cache_bg": jnp.ones(cfg.mask_cache_world_size, dtype=bool),
    }
    return params, buffers


def sample_bg_pts(rays_o, rays_d, t_max, bg_preserve: float, n_samples: int):
    """Inverted-sphere background sampling (render_utils_kernel.cu:300-360)."""
    k = jnp.arange(n_samples, dtype=rays_o.dtype)
    ori_t = t_max[:, None] - 1.0 + 1.0 / (1.0 - k / n_samples)[None, :]
    pts = rays_o[:, None, :] + rays_d[:, None, :] * ori_t[..., None]
    t_outer = jnp.linalg.norm(pts, axis=-1)
    r_outer = t_outer / jnp.max(jnp.abs(pts), axis=-1)
    o2i = (r_outer**2) / (t_outer**2) * (1.0 - bg_preserve) + r_outer / t_outer * bg_preserve
    return pts * o2i[..., None]


def _field_forward(cfg, fparams, mask_cache, pts, valid, viewdirs, interval,
                   xyz_min, xyz_max):
    """One field's masked render terms (_forward, lib/dbvgo.py:248-309)."""
    N, K = pts.shape[:2]
    valid = valid & grid_sample.nearest_mask_lookup(mask_cache, pts, xyz_min, xyz_max)
    ind01 = grid_sample.world_to_ind01(pts, xyz_min, xyz_max)
    density = common.grid_query(cfg.density_type, fparams["density"], ind01)[..., 0]
    alpha = render.raw2alpha(density, cfg.act_shift, interval)
    if cfg.fast_color_thres > 0:
        valid &= alpha > cfg.fast_color_thres
    weights, alphainv_last, _ = render.alpha2weight(alpha, valid)
    if cfg.fast_color_thres > 0:
        weights = jnp.where(weights > cfg.fast_color_thres, weights, 0.0)
    k0 = common.grid_query(cfg.k0_type, fparams["k0"], ind01)
    if "rgbnet" not in fparams:
        rgb = jax.nn.sigmoid(k0)
    else:
        vdir = ray_ops.positional_encoding(viewdirs, cfg.viewbase_pe)
        vdir = jnp.broadcast_to(vdir[:, None, :], (N, K, vdir.shape[-1]))
        feat = jnp.concatenate([k0, vdir], axis=-1)
        rgb = jax.nn.sigmoid(common.mlp_apply(fparams["rgbnet"], feat, jax.nn.relu))
    return {
        "rgb": rgb, "alpha": jnp.where(valid, alpha, 0.0), "weights": weights,
        "alphainv_last": alphainv_last,
        "marched": render.composite(weights, rgb),
    }


def forward(cfg: Config, params: dict, buffers: dict, rays_o, rays_d, viewdirs, *,
            stepsize: float, bg: float = 0.0, render_depth: bool = False,
            **unused) -> dict[str, Any]:
    """(/root/reference/lib/dbvgo.py:310-398): fg over bg over constant."""
    center = jnp.asarray(cfg.scene_center, dtype=rays_o.dtype)
    radius = jnp.asarray(cfg.scene_radius, dtype=rays_o.dtype)
    o = (rays_o - center) / radius
    d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    xyz_min, xyz_max = jnp.asarray(cfg.xyz_min), jnp.asarray(cfg.xyz_max)
    interval = stepsize * cfg.voxel_size_ratio
    stepdist = stepsize * cfg.voxel_size

    # fg: bounded sampling in the unit cube
    k_fg = cfg.n_samples_fg(stepsize)
    pts_fg, valid_fg, _t_min = render.sample_pts_on_rays_fixed(
        o, d, xyz_min, xyz_max, 0.0, 2.0 * float(np.sqrt(3.0)), stepdist, k_fg
    )
    _, t_max = render.ray_aabb(o, d, xyz_min, xyz_max, 0.0, 2.0 * float(np.sqrt(3.0)))
    fg = _field_forward(cfg, params["fg"], buffers["mask_cache_fg"], pts_fg,
                        valid_fg, viewdirs, interval, xyz_min, xyz_max)

    # bg: inverted-sphere samples beyond the cube; rays already occluded by
    # the fg are skipped in the reference -- with masked compute they simply
    # contribute ~nothing through the fg transmittance factor
    k_bg = cfg.n_samples_bg(stepsize)
    pts_bg = sample_bg_pts(o, d, t_max, cfg.bg_preserve, k_bg)
    valid_bg = jnp.ones(pts_bg.shape[:2], dtype=bool)
    if cfg.fast_color_thres > 0:
        valid_bg &= (fg["alphainv_last"] > cfg.fast_color_thres)[:, None]
    bg_f = _field_forward(cfg, params["bg"], buffers["mask_cache_bg"], pts_bg,
                          valid_bg, viewdirs, interval, xyz_min, xyz_max)

    rgb_marched = (
        fg["marched"]
        + fg["alphainv_last"][:, None] * bg_f["marched"]
        + (fg["alphainv_last"] * bg_f["alphainv_last"])[:, None] * bg
    )
    out = {
        "rgb_marched": rgb_marched,
        "rgb_feature": rgb_marched,
        "alphainv_last": fg["alphainv_last"] * bg_f["alphainv_last"],
        "weights_fg": fg["weights"], "weights_bg": bg_f["weights"],
        "raw_rgb": fg["rgb"],
        "weights": fg["weights"],
        "n_max": k_fg,
        "s": jnp.broadcast_to(
            (jnp.arange(k_fg, dtype=rgb_marched.dtype) + 0.5) / k_fg,
            fg["weights"].shape,
        ),
    }
    if render_depth:
        step_fg = jnp.broadcast_to(
            jnp.arange(k_fg, dtype=rgb_marched.dtype)[None, :], fg["weights"].shape
        )
        out["depth"] = jax.lax.stop_gradient(render.composite(fg["weights"], step_fg))
    return out

"""DirectVoxGO: dense-grid radiance field for bounded inward-facing scenes.

TPU-native redesign of /root/reference/lib/dvgo.py (DirectVoxGO). The
reference samples a *variable* number of points per ray
(sample_pts_on_rays_cuda); here every ray gets a static K (the bbox-diagonal
bound, same bound the reference's voxel_count_views uses,
lib/dvgo.py:239) and out-of-segment samples are masked -- carried as alpha=0
through the transmittance product, which reproduces the ragged math exactly.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from fourk_nerf_tpu.models import common
from fourk_nerf_tpu.ops import grid_sample, render, rays as ray_ops


@dataclasses.dataclass(frozen=True)
class Config:
    xyz_min: tuple
    xyz_max: tuple
    num_voxels: int
    num_voxels_base: int
    world_size: tuple
    mask_cache_world_size: tuple
    voxel_size: float
    voxel_size_base: float
    alpha_init: float
    fast_color_thres: float = 0.0
    mask_cache_thres: float = 1e-3
    mask_cache_path: str | None = None
    density_type: str = "DenseGrid"
    k0_type: str = "DenseGrid"
    density_config: tuple = ()
    k0_config: tuple = ()
    rgbnet_dim: int = 0
    rgbnet_direct: bool = False
    rgbnet_full_implicit: bool = False
    rgbnet_depth: int = 3
    rgbnet_width: int = 128
    viewbase_pe: int = 4
    act_type: str = "relu"
    dim_rend: int = 3
    mode_type: str = "mlp"

    @property
    def voxel_size_ratio(self) -> float:
        return self.voxel_size / self.voxel_size_base

    @property
    def k0_dim(self) -> int:
        if self.rgbnet_dim <= 0:
            return 3
        return 0 if self.rgbnet_full_implicit else self.rgbnet_dim

    @property
    def dim0(self) -> int:
        d = 3 + 3 * self.viewbase_pe * 2  # /root/reference/lib/dvgo.py:94-101
        if self.rgbnet_full_implicit:
            return d
        return d + (self.k0_dim if self.rgbnet_direct else self.k0_dim - 3)

    @property
    def act_shift(self) -> float:
        # density bias so initial alpha == alpha_init (/root/reference/lib/dvgo.py:46)
        return float(np.log(1.0 / (1.0 - self.alpha_init) - 1.0))

    def n_samples_ref(self, stepsize: float) -> int:
        """The reference's nominal bound used to normalize ``s``
        (/root/reference/lib/dvgo.py:311)."""
        return int((max(self.world_size) - 1) / stepsize) + 1

    def n_samples(self, stepsize: float) -> int:
        """Static per-ray sample count: bbox-diagonal bound, covering the
        longest possible chord (cf. lib/dvgo.py:239)."""
        return int(np.linalg.norm(np.array(self.world_size) + 1) / stepsize) + 1


def make_config(xyz_min, xyz_max, num_voxels, num_voxels_base, alpha_init,
                mask_cache_world_size=None, **kwargs) -> Config:
    world_size, voxel_size = common.dvgo_grid_resolution(xyz_min, xyz_max, num_voxels)
    _, voxel_size_base = common.dvgo_grid_resolution(xyz_min, xyz_max, num_voxels_base)
    if mask_cache_world_size is None:
        mask_cache_world_size = world_size
    known = {f.name for f in dataclasses.fields(Config)}
    derived = {"xyz_min", "xyz_max", "num_voxels", "num_voxels_base", "world_size",
               "mask_cache_world_size", "voxel_size", "voxel_size_base",
               "alpha_init", "voxel_size_ratio"}
    extra = {k: v for k, v in kwargs.items() if k in known - derived}
    for gk in ("density_config", "k0_config"):
        if isinstance(extra.get(gk), dict):
            extra[gk] = tuple(sorted(extra[gk].items()))
    return Config(
        xyz_min=tuple(float(v) for v in np.asarray(xyz_min)),
        xyz_max=tuple(float(v) for v in np.asarray(xyz_max)),
        num_voxels=int(num_voxels),
        num_voxels_base=int(num_voxels_base),
        world_size=tuple(world_size),
        mask_cache_world_size=tuple(int(v) for v in mask_cache_world_size),
        voxel_size=float(voxel_size),
        voxel_size_base=float(voxel_size_base),
        alpha_init=float(alpha_init),
        **extra,
    )


def get_kwargs(cfg: Config) -> dict:
    """Checkpoint self-description (/root/reference/lib/dvgo.py:164-184)."""
    return {
        "xyz_min": list(cfg.xyz_min),
        "xyz_max": list(cfg.xyz_max),
        "num_voxels": cfg.num_voxels,
        "num_voxels_base": cfg.num_voxels_base,
        "alpha_init": cfg.alpha_init,
        "voxel_size_ratio": cfg.voxel_size_ratio,
        "mask_cache_path": cfg.mask_cache_path,
        "mask_cache_thres": cfg.mask_cache_thres,
        "mask_cache_world_size": list(cfg.mask_cache_world_size),
        "fast_color_thres": cfg.fast_color_thres,
        "density_type": cfg.density_type,
        "k0_type": cfg.k0_type,
        "density_config": dict(cfg.density_config),
        "k0_config": dict(cfg.k0_config),
        "mode_type": cfg.mode_type,
        "act_type": cfg.act_type,
        "dim_rend": cfg.dim_rend,
        "rgbnet_dim": cfg.rgbnet_dim,
        "rgbnet_direct": cfg.rgbnet_direct,
        "rgbnet_full_implicit": cfg.rgbnet_full_implicit,
        "rgbnet_depth": cfg.rgbnet_depth,
        "rgbnet_width": cfg.rgbnet_width,
        "viewbase_pe": cfg.viewbase_pe,
    }


def init(cfg: Config, key: jax.Array, init_mask: np.ndarray | None = None):
    key, kd, kk = jax.random.split(key, 3)
    params: dict = {
        "density": common.grid_init(cfg.density_type, kd, 1, cfg.world_size, cfg.density_config),
        "k0": common.grid_init(cfg.k0_type, kk, cfg.k0_dim, cfg.world_size, cfg.k0_config),
    }
    if cfg.rgbnet_dim > 0:
        dims = [cfg.dim0] + [cfg.rgbnet_width] * (cfg.rgbnet_depth - 1) + [3]
        params["rgbnet"] = common.mlp_init(key, dims)
    buffers = {
        "mask_cache": (
            jnp.asarray(init_mask, dtype=bool)
            if init_mask is not None
            else jnp.ones(cfg.mask_cache_world_size, dtype=bool)
        ),
    }
    return params, buffers


def _xyz_minmax(cfg: Config, dtype=jnp.float32):
    return jnp.asarray(cfg.xyz_min, dtype=dtype), jnp.asarray(cfg.xyz_max, dtype=dtype)


def sample_ray(cfg: Config, rays_o, rays_d, *, near, far, stepsize: float):
    """Fixed-shape bounded-scene sampling (see ops.render.sample_pts_on_rays_fixed)."""
    stepdist = stepsize * cfg.voxel_size
    K = cfg.n_samples(stepsize)
    xyz_min, xyz_max = _xyz_minmax(cfg)
    pts, valid, t_min = render.sample_pts_on_rays_fixed(
        rays_o, rays_d, xyz_min, xyz_max, near, far, stepdist, K
    )
    return pts, valid, t_min


def forward(cfg: Config, params: dict, buffers: dict, rays_o, rays_d, viewdirs, *,
            stepsize: float, near, far, bg: float = 0.0, is_train: bool = False,
            render_depth: bool = False, key: jax.Array | None = None,
            **unused) -> dict[str, Any]:
    """Volume rendering; reference /root/reference/lib/dvgo.py:327-448."""
    N = rays_o.shape[0]
    xyz_min, xyz_max = _xyz_minmax(cfg)
    interval = stepsize * cfg.voxel_size_ratio

    pts, valid, _t_min = sample_ray(cfg, rays_o, rays_d, near=near, far=far, stepsize=stepsize)
    K = pts.shape[1]

    valid &= grid_sample.nearest_mask_lookup(buffers["mask_cache"], pts, xyz_min, xyz_max)

    ind01 = grid_sample.world_to_ind01(pts, xyz_min, xyz_max)
    density = common.grid_query(cfg.density_type, params["density"], ind01)[..., 0]
    alpha = render.raw2alpha(density, cfg.act_shift, interval)
    if cfg.fast_color_thres > 0:
        valid &= alpha > cfg.fast_color_thres

    weights, alphainv_last, _T = render.alpha2weight(alpha, valid)
    if cfg.fast_color_thres > 0:
        weights = jnp.where(weights > cfg.fast_color_thres, weights, 0.0)

    if cfg.rgbnet_full_implicit:
        k0 = None
    else:
        k0 = common.grid_query(cfg.k0_type, params["k0"], ind01)  # [N,K,C]

    if cfg.rgbnet_dim <= 0:
        rgb_raw = jax.nn.sigmoid(k0)
    else:
        vdir_emb = ray_ops.positional_encoding(viewdirs, cfg.viewbase_pe)
        vdir_emb = jnp.broadcast_to(vdir_emb[:, None, :], (N, K, vdir_emb.shape[-1]))
        if cfg.rgbnet_full_implicit:
            rgb_feat = vdir_emb
        elif cfg.rgbnet_direct:
            rgb_feat = jnp.concatenate([k0, vdir_emb], axis=-1)
        else:
            rgb_feat = jnp.concatenate([k0[..., 3:], vdir_emb], axis=-1)
        act = common.activation(cfg.act_type) if cfg.act_type else jax.nn.relu
        rgb_logit = common.mlp_apply(params["rgbnet"], rgb_feat, act)
        if cfg.rgbnet_direct or cfg.rgbnet_full_implicit:
            rgb_raw = jax.nn.sigmoid(rgb_logit)
        else:
            rgb_raw = jax.nn.sigmoid(rgb_logit + k0[..., :3])

    rgb_feature = render.composite(weights, rgb_raw)
    rgb_marched = rgb_feature + alphainv_last[:, None] * bg

    n_ref = cfg.n_samples_ref(stepsize)
    s = (jnp.arange(K, dtype=rgb_marched.dtype) + 0.5) / n_ref  # lib/dvgo.py:428
    s = jnp.broadcast_to(s[None, :], (N, K))

    out = {
        "alphainv_last": alphainv_last,
        "weights": weights,
        "rgb_marched": rgb_marched,
        "rgb_feature": rgb_feature,
        "raw_alpha": jnp.where(valid, alpha, 0.0),
        "raw_rgb": rgb_raw,
        "n_max": n_ref,
        "s": s,
    }
    if render_depth:
        out["depth"] = jax.lax.stop_gradient(render.composite(weights, s))
    return out


# ---------------------------------------------------------------------------
# Host-side maintenance
# ---------------------------------------------------------------------------

def _grid_xyz(cfg: Config, shape):
    # Traced (iota-based) coordinates: a numpy meshgrid here would be baked
    # into the HLO as a full-grid f32 constant when called under jit (~450 MB
    # at fern mask-cache scale), overflowing the remote-compile payload.
    xs = [jnp.linspace(cfg.xyz_min[d], cfg.xyz_max[d], int(shape[d]),
                       dtype=jnp.float32) for d in range(3)]
    gx, gy, gz = jnp.meshgrid(*xs, indexing="ij")
    return jnp.stack([gx, gy, gz], axis=-1)


def hit_coarse_geo(cfg: Config, buffers: dict, rays_o, rays_d, *, near, far,
                   stepsize: float, **unused):
    """True for rays whose samples hit the coarse occupancy
    (/root/reference/lib/dvgo.py:281-293)."""
    pts, valid, _ = sample_ray(cfg, rays_o, rays_d, near=near, far=far, stepsize=stepsize)
    xyz_min, xyz_max = _xyz_minmax(cfg)
    hit = valid & grid_sample.nearest_mask_lookup(buffers["mask_cache"], pts, xyz_min, xyz_max)
    return jnp.any(hit, axis=-1)


def maskout_near_cam_vox(cfg: Config, params: dict, cam_o: np.ndarray, near: float) -> dict:
    """Set density=-100 for voxels closer than ``near`` to any camera
    (/root/reference/lib/dvgo.py:186-198)."""
    xyz = _grid_xyz(cfg, cfg.world_size)  # [X,Y,Z,3]
    cam = jnp.asarray(cam_o, dtype=jnp.float32)
    d2 = jnp.min(
        jnp.sum((xyz[..., None, :] - cam) ** 2, axis=-1), axis=-1
    )
    nearest = jnp.sqrt(d2)
    density = jnp.where((nearest <= near)[..., None], -100.0, params["density"])
    return {**params, "density": density}


def update_occupancy_cache(cfg: Config, params: dict, buffers: dict) -> dict:
    """(/root/reference/lib/dvgo.py:223-233)"""
    xyz = _grid_xyz(cfg, buffers["mask_cache"].shape)
    xyz_min, xyz_max = _xyz_minmax(cfg)
    ind01 = grid_sample.world_to_ind01(xyz, xyz_min, xyz_max)
    density = common.grid_query(cfg.density_type, params["density"], ind01)[..., 0]
    alpha = render.raw2alpha(density, cfg.act_shift, cfg.voxel_size_ratio)
    alpha = grid_sample.max_pool3d_same(alpha)
    return {**buffers, "mask_cache": buffers["mask_cache"] & (alpha > cfg.fast_color_thres)}


def scale_volume_grid(cfg: Config, params: dict, buffers: dict, num_voxels: int):
    """(/root/reference/lib/dvgo.py:200-221)"""
    world_size, voxel_size = common.dvgo_grid_resolution(cfg.xyz_min, cfg.xyz_max, num_voxels)
    new_cfg = dataclasses.replace(
        cfg, num_voxels=int(num_voxels), world_size=tuple(world_size), voxel_size=voxel_size
    )
    new_params = dict(params)
    new_params["density"] = common.grid_resize(cfg.density_type, params["density"], world_size)
    new_params["k0"] = common.grid_resize(cfg.k0_type, params["k0"], world_size)

    new_buffers = dict(buffers)
    if int(np.prod(world_size)) <= 256**3:
        xyz = _grid_xyz(new_cfg, world_size)
        xyz_min, xyz_max = _xyz_minmax(new_cfg)
        old_mask_at_new = grid_sample.nearest_mask_lookup(
            buffers["mask_cache"], xyz, xyz_min, xyz_max
        )
        dense_density = common.grid_dense(cfg.density_type, new_params["density"], 1)
        alpha = render.raw2alpha(
            dense_density[..., 0], new_cfg.act_shift, new_cfg.voxel_size_ratio
        )
        alpha = grid_sample.max_pool3d_same(alpha)
        new_buffers["mask_cache"] = old_mask_at_new & (alpha > new_cfg.fast_color_thres)
        new_cfg = dataclasses.replace(new_cfg, mask_cache_world_size=tuple(world_size))
    return new_cfg, new_params, new_buffers


def voxel_count_views(cfg: Config, rays_o_all, rays_d_all, imsz, near, far,
                      stepsize: float, downrate: int = 1) -> jnp.ndarray:
    """Per-voxel count of views whose rays touch it, for per-voxel lr
    (/root/reference/lib/dvgo.py:235-266). ``rays_o_all`` is a list of [H,W,3]
    (or flat [M,3]) per view."""
    K = int(np.linalg.norm(np.array(cfg.world_size) + 1) / stepsize) + 1
    far = 1e9
    xyz_min, xyz_max = _xyz_minmax(cfg)
    X, Y, Z = cfg.world_size
    count = jnp.zeros((X, Y, Z, 1), dtype=jnp.float32)

    def one_chunk_weightsum(ones_grid, ro, rd):
        t_min, _ = render.ray_aabb(ro, rd, xyz_min, xyz_max, near, far)
        step = stepsize * cfg.voxel_size * jnp.arange(K, dtype=ro.dtype)
        interpx = t_min[:, None] + step[None, :] / jnp.linalg.norm(rd, axis=-1, keepdims=True)
        pts = ro[:, None, :] + rd[:, None, :] * interpx[..., None]
        return jnp.sum(grid_sample.grid_query(ones_grid, pts, xyz_min, xyz_max))

    grad_fn = jax.jit(jax.grad(one_chunk_weightsum))
    ones_grid = jnp.ones((X, Y, Z, 1), dtype=jnp.float32)
    for ro_view, rd_view in zip(rays_o_all, rays_d_all):
        ro = jnp.asarray(ro_view)[::downrate, ::downrate].reshape(-1, 3)
        rd = jnp.asarray(rd_view)[::downrate, ::downrate].reshape(-1, 3)
        g = jnp.zeros_like(count)
        chunk = 10000
        for i in range(0, ro.shape[0], chunk):
            g = g + grad_fn(ones_grid, ro[i : i + chunk], rd[i : i + chunk])
        count = count + (g > 1).astype(jnp.float32)
    return count


def _tv_dispatch(grid_type, gparams, w, sparse_grad):
    if grid_type == "DenseGrid":
        return render.total_variation_grad(gparams, w, w, w, sparse_grad)
    from fourk_nerf_tpu.ops import tensorf

    return jax.grad(lambda p: tensorf.tensorf_tv_loss(p, w, w, w))(gparams)


def density_tv_grad(cfg: Config, params: dict, weight: float, dense_mode: bool,
                    n_rays: int, density_grad):
    """(/root/reference/lib/dvgo.py:268-270): w = weight*max(world)/128, equal axes."""
    w = weight / n_rays * max(cfg.world_size) / 128.0
    return _tv_dispatch(cfg.density_type, params["density"], w, None if dense_mode else density_grad)


def k0_tv_grad(cfg: Config, params: dict, weight: float, dense_mode: bool,
               n_rays: int, k0_grad):
    w = weight / n_rays * max(cfg.world_size) / 128.0
    return _tv_dispatch(cfg.k0_type, params["k0"], w, None if dense_mode else k0_grad)

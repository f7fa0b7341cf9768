"""DirectContractedVoxGO: unbounded-360 voxel radiance field.

TPU-native rebuild of /root/reference/lib/dcvgo.py: scene contraction (inf/l2
norm warps the exterior into a shell of width ``bg_len``), a fixed shared
sample lattice (already static-shape in the reference: the same ``t`` vector
serves every ray, lib/dcvgo.py:239-246), a cumulative-distance spacing filter
for oversampled contracted points (the ``cumdist_thres`` CUDA scan,
ub360_utils_kernel.cu:12-47, here a ``lax.scan``), and the same dense masked
transmittance compositing as the other models.
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
    bg_len: float = 0.2
    contracted_norm: str = "inf"
    fast_color_thres: float = 0.0
    density_type: str = "DenseGrid"
    k0_type: str = "DenseGrid"
    density_config: tuple = ()  # hashable dict items (TensoRF n_comp etc.)
    k0_config: tuple = ()
    rgbnet_dim: int = 0
    rgbnet_depth: int = 3
    rgbnet_width: int = 128
    viewbase_pe: int = 4

    @property
    def xyz_min(self) -> tuple:
        return (-1.0 - self.bg_len,) * 3

    @property
    def xyz_max(self) -> tuple:
        return (1.0 + self.bg_len,) * 3

    @property
    def voxel_size_ratio(self) -> float:
        return self.voxel_size / self.voxel_size_base

    @property
    def world_len(self) -> int:
        return self.world_size[0]

    @property
    def k0_dim(self) -> int:
        return 3 if self.rgbnet_dim <= 0 else self.rgbnet_dim

    @property
    def act_shift(self) -> float:
        return float(np.log(1.0 / (1.0 - self.alpha_init) - 1.0))

    def n_samples(self, stepsize: float) -> int:
        n_inner = int(2.0 / (2.0 + 2.0 * self.bg_len) * self.world_len / stepsize) + 1
        return n_inner * 2  # inner + outer (N_outer = N_inner, lib/dcvgo.py:240)


def make_config(xyz_min, xyz_max, num_voxels, num_voxels_base, alpha_init,
                mask_cache_world_size=None, bg_len=0.2, **kwargs) -> Config:
    """``xyz_min/xyz_max`` here are the fg/bg separating cube (the reference's
    constructor args); the grid itself spans [-1-bg_len, 1+bg_len]^3."""
    xyz_min = np.asarray(xyz_min, dtype=np.float64)
    xyz_max = np.asarray(xyz_max, dtype=np.float64)
    full_min = np.full(3, -1.0 - bg_len)
    full_max = np.full(3, 1.0 + bg_len)
    _, voxel_size = _cube_resolution(full_min, full_max, num_voxels)
    world_size, _ = _cube_resolution(full_min, full_max, num_voxels)
    _, voxel_size_base = _cube_resolution(full_min, full_max, num_voxels_base)
    if mask_cache_world_size is None:
        mask_cache_world_size = world_size
    known = {f.name for f in dataclasses.fields(Config)}
    derived = {"scene_center", "scene_radius", "num_voxels", "num_voxels_base",
               "world_size", "mask_cache_world_size", "voxel_size",
               "voxel_size_base", "alpha_init", "bg_len", "voxel_size_ratio"}
    extra = {k: v for k, v in kwargs.items() if k in known - derived}
    for gk in ("density_config", "k0_config"):
        if isinstance(extra.get(gk), dict):
            extra[gk] = tuple(sorted(extra[gk].items()))
    return Config(
        scene_center=tuple(((xyz_min + xyz_max) * 0.5).tolist()),
        scene_radius=tuple(((xyz_max - xyz_min) * 0.5).tolist()),
        num_voxels=int(num_voxels), num_voxels_base=int(num_voxels_base),
        world_size=tuple(world_size),
        mask_cache_world_size=tuple(int(v) for v in mask_cache_world_size),
        voxel_size=float(voxel_size), voxel_size_base=float(voxel_size_base),
        alpha_init=float(alpha_init), bg_len=float(bg_len), **extra,
    )


def _cube_resolution(xyz_min, xyz_max, num_voxels):
    voxel_size = (np.prod(xyz_max - xyz_min) / num_voxels) ** (1.0 / 3.0)
    world_size = ((xyz_max - xyz_min) / voxel_size).astype(np.int64)
    return tuple(int(w) for w in world_size), float(voxel_size)


def get_kwargs(cfg: Config) -> dict:
    """(/root/reference/lib/dcvgo.py:137-153); xyz_min/max reported as the
    fg/bg cube reconstructed from center/radius."""
    c = np.asarray(cfg.scene_center)
    r = np.asarray(cfg.scene_radius)
    return {
        "xyz_min": (c - r).tolist(),
        "xyz_max": (c + r).tolist(),
        "num_voxels": cfg.num_voxels,
        "num_voxels_base": cfg.num_voxels_base,
        "alpha_init": cfg.alpha_init,
        "voxel_size_ratio": cfg.voxel_size_ratio,
        "mask_cache_world_size": list(cfg.mask_cache_world_size),
        "fast_color_thres": cfg.fast_color_thres,
        "contracted_norm": cfg.contracted_norm,
        "bg_len": cfg.bg_len,
        "density_type": cfg.density_type,
        "k0_type": cfg.k0_type,
        "density_config": dict(cfg.density_config),
        "k0_config": dict(cfg.k0_config),
        "rgbnet_dim": cfg.rgbnet_dim,
        "rgbnet_depth": cfg.rgbnet_depth,
        "rgbnet_width": cfg.rgbnet_width,
        "viewbase_pe": cfg.viewbase_pe,
    }


def init(cfg: Config, key: jax.Array, init_mask=None):
    key, kd, kk = jax.random.split(key, 3)
    # grid-type dispatch mirrors the reference's create_grid
    # (/root/reference/lib/grid.py:27-35) -- DenseGrid or TensoRF
    params: dict = {
        "density": common.grid_init(cfg.density_type, kd, 1, cfg.world_size,
                                    cfg.density_config),
        "k0": common.grid_init(cfg.k0_type, kk, cfg.k0_dim, cfg.world_size,
                               cfg.k0_config),
    }
    if cfg.rgbnet_dim > 0:
        dim0 = 3 + 3 * cfg.viewbase_pe * 2 + cfg.k0_dim
        dims = [dim0] + [cfg.rgbnet_width] * (cfg.rgbnet_depth - 1) + [3]
        params["rgbnet"] = common.mlp_init(key, dims)
    buffers = {
        "mask_cache": (
            jnp.asarray(init_mask, dtype=bool) if init_mask is not None
            else jnp.ones(cfg.mask_cache_world_size, dtype=bool)
        ),
    }
    return params, buffers


def _xyz_minmax(cfg: Config, dtype=jnp.float32):
    return jnp.asarray(cfg.xyz_min, dtype=dtype), jnp.asarray(cfg.xyz_max, dtype=dtype)


def sample_ray(cfg: Config, rays_o, rays_d, *, stepsize: float):
    """Contracted-space sampling on a shared fixed lattice
    (/root/reference/lib/dcvgo.py:226-260). Returns (pts [N,K,3], inner_mask
    [N,K], t [K])."""
    center = jnp.asarray(cfg.scene_center, dtype=rays_o.dtype)
    radius = jnp.asarray(cfg.scene_radius, dtype=rays_o.dtype)
    o = (rays_o - center) / radius
    d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    n_inner = int(2.0 / (2.0 + 2.0 * cfg.bg_len) * cfg.world_len / stepsize) + 1
    n_outer = n_inner
    b_inner = jnp.linspace(0.0, 2.0, n_inner + 1)
    b_outer = 2.0 / jnp.linspace(1.0, 1.0 / 128.0, n_outer + 1)
    t = jnp.concatenate([
        (b_inner[1:] + b_inner[:-1]) * 0.5,
        (b_outer[1:] + b_outer[:-1]) * 0.5,
    ])
    pts = o[:, None, :] + d[:, None, :] * t[None, :, None]
    if cfg.contracted_norm == "inf":
        norm = jnp.max(jnp.abs(pts), axis=-1, keepdims=True)
    elif cfg.contracted_norm == "l2":
        norm = jnp.linalg.norm(pts, axis=-1, keepdims=True)
    else:
        raise NotImplementedError(cfg.contracted_norm)
    inner = norm <= 1
    pts = jnp.where(inner, pts, pts / norm * ((1 + cfg.bg_len) - cfg.bg_len / norm))
    return pts, inner[..., 0], t


def cumdist_keep_mask(dist, thres: float):
    """Sequential spacing filter: walking near-to-far, accumulate inter-sample
    distance; a sample is kept when the accumulator exceeds ``thres`` (then
    resets). Matches cumdist_thres_cuda (ub360_utils_kernel.cu:12-47).

    dist: [N, K-1] distances between consecutive samples. Returns [N, K-1]
    bool (mask for samples 1..K-1).
    """
    def step(cum, dk):
        cum = cum + dk
        over = cum > thres
        return jnp.where(over, 0.0, cum), over

    _, over = jax.lax.scan(step, jnp.zeros(dist.shape[0], dist.dtype), dist.T)
    return over.T


def forward(cfg: Config, params: dict, buffers: dict, rays_o, rays_d, viewdirs, *,
            stepsize: float, bg: float = 0.0, rand_bkgd: bool = False,
            is_train: bool = False, render_depth: bool = False,
            key: jax.Array | None = None, **unused) -> dict[str, Any]:
    """(/root/reference/lib/dcvgo.py:262-382)"""
    N = rays_o.shape[0]
    xyz_min, xyz_max = _xyz_minmax(cfg)
    interval = stepsize * cfg.voxel_size_ratio

    pts, inner_mask, t = sample_ray(cfg, rays_o, rays_d, stepsize=stepsize)
    K = pts.shape[1]
    n_max = K

    # spacing filter over contracted points (drop oversampled outer points)
    dist_thres = (2.0 + 2.0 * cfg.bg_len) / cfg.world_len * stepsize * 0.95
    dist = jnp.linalg.norm(pts[:, 1:] - pts[:, :-1], axis=-1)
    keep_tail = cumdist_keep_mask(dist, dist_thres)
    valid = inner_mask | jnp.concatenate(
        [jnp.zeros_like(inner_mask[:, :1]), keep_tail], axis=1
    )

    valid &= grid_sample.nearest_mask_lookup(buffers["mask_cache"], pts, xyz_min, xyz_max)

    ind01 = grid_sample.world_to_ind01(pts, xyz_min, xyz_max)
    density = common.grid_query(cfg.density_type, params["density"], ind01)[..., 0]
    alpha = render.raw2alpha(density, cfg.act_shift, interval)
    if cfg.fast_color_thres > 0:
        valid &= alpha > cfg.fast_color_thres

    weights, alphainv_last, _T = render.alpha2weight(alpha, valid)
    if cfg.fast_color_thres > 0:
        weights = jnp.where(weights > cfg.fast_color_thres, weights, 0.0)

    k0 = common.grid_query(cfg.k0_type, params["k0"], ind01)
    if cfg.rgbnet_dim <= 0:
        rgb_raw = jax.nn.sigmoid(k0)
    else:
        vdir_emb = ray_ops.positional_encoding(viewdirs, cfg.viewbase_pe)
        vdir_emb = jnp.broadcast_to(vdir_emb[:, None, :], (N, K, vdir_emb.shape[-1]))
        rgb_feat = jnp.concatenate([k0, vdir_emb], axis=-1)
        rgb_logit = common.mlp_apply(params["rgbnet"], rgb_feat, jax.nn.relu)
        rgb_raw = jax.nn.sigmoid(rgb_logit)

    rgb_marched = render.composite(weights, rgb_raw)
    if rand_bkgd and is_train:
        assert key is not None
        noise = jax.random.uniform(key, rgb_marched.shape, dtype=rgb_marched.dtype)
        rgb_marched = rgb_marched + alphainv_last[:, None] * noise
    else:
        rgb_marched = rgb_marched + alphainv_last[:, None] * bg

    wsum_mid = jnp.sum(jnp.where(inner_mask, weights, 0.0), axis=-1)
    t_b = jnp.broadcast_to(t[None, :], (N, K))
    s = 1.0 - 1.0 / (1.0 + t_b)  # [0, inf) -> [0, 1)

    out = {
        "alphainv_last": alphainv_last,
        "weights": weights,
        "wsum_mid": wsum_mid,
        "rgb_marched": rgb_marched,
        "rgb_feature": rgb_marched,
        "raw_density": jnp.where(valid, density, 0.0),
        "raw_alpha": jnp.where(valid, alpha, 0.0),
        "raw_rgb": rgb_raw,
        "t": t_b,
        "s": s,
        "n_max": n_max,
    }
    if render_depth:
        out["depth"] = jax.lax.stop_gradient(render.composite(weights, s))
    return out


# ---------------------------------------------------------------------------
# maintenance (shared shapes with dvgo)
# ---------------------------------------------------------------------------

def _grid_xyz(cfg: Config, shape):
    # Traced (iota-based) coordinates: a numpy meshgrid here would be baked
    # into the HLO as a full-grid f32 constant when called under jit (~450 MB
    # at fern mask-cache scale), overflowing the remote-compile payload.
    xs = [jnp.linspace(cfg.xyz_min[d], cfg.xyz_max[d], int(shape[d]),
                       dtype=jnp.float32) for d in range(3)]
    gx, gy, gz = jnp.meshgrid(*xs, indexing="ij")
    return jnp.stack([gx, gy, gz], axis=-1)


def update_occupancy_cache(cfg: Config, params: dict, buffers: dict) -> dict:
    xyz = _grid_xyz(cfg, buffers["mask_cache"].shape)
    xyz_min, xyz_max = _xyz_minmax(cfg)
    ind01 = grid_sample.world_to_ind01(xyz, xyz_min, xyz_max)
    density = common.grid_query(cfg.density_type, params["density"], ind01)[..., 0]
    alpha = render.raw2alpha(density, cfg.act_shift, cfg.voxel_size_ratio)
    alpha = grid_sample.max_pool3d_same(alpha)
    return {**buffers, "mask_cache": buffers["mask_cache"] & (alpha > cfg.fast_color_thres)}


def scale_volume_grid(cfg: Config, params: dict, buffers: dict, num_voxels: int):
    full_min = np.asarray(cfg.xyz_min)
    full_max = np.asarray(cfg.xyz_max)
    world_size, voxel_size = _cube_resolution(full_min, full_max, num_voxels)
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
        old_mask = grid_sample.nearest_mask_lookup(buffers["mask_cache"], xyz, xyz_min, xyz_max)
        density_dense = common.grid_dense(cfg.density_type, new_params["density"], 1)
        alpha = render.raw2alpha(
            density_dense[..., 0], new_cfg.act_shift, new_cfg.voxel_size_ratio
        )
        alpha = grid_sample.max_pool3d_same(alpha)
        new_buffers["mask_cache"] = old_mask & (alpha > new_cfg.fast_color_thres)
        new_cfg = dataclasses.replace(new_cfg, mask_cache_world_size=tuple(world_size))
    return new_cfg, new_params, new_buffers


def _tv_dispatch(grid_type, gparams, w, sparse_grad):
    if grid_type == "DenseGrid":
        return render.total_variation_grad(gparams, w, w, w, sparse_grad)
    from fourk_nerf_tpu.ops import tensorf

    return jax.grad(lambda p: tensorf.tensorf_tv_loss(p, w, w, w))(gparams)


def density_tv_grad(cfg: Config, params: dict, weight: float, dense_mode: bool,
                    n_rays: int, density_grad):
    w = weight / n_rays * max(cfg.world_size) / 128.0
    return _tv_dispatch(cfg.density_type, params["density"], w,
                        None if dense_mode else density_grad)


def k0_tv_grad(cfg: Config, params: dict, weight: float, dense_mode: bool,
               n_rays: int, k0_grad):
    w = weight / n_rays * max(cfg.world_size) / 128.0
    return _tv_dispatch(cfg.k0_type, params["k0"], w,
                        None if dense_mode else k0_grad)

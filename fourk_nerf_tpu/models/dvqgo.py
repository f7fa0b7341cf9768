"""DirectQVGO: vector-quantized variant of DirectMPIGO.

Rebuild of /root/reference/lib/dvqgo.py: the per-point feature grid is
replaced by an EMA VQ codebook queried with the spatial positional encoding
(lib/dvqgo.py:322-327); selected by ``mode_type == 'adain_vq'`` in the
reference driver (run.py:287-293). Shares the MPI geometry path with
:mod:`fourk_nerf_tpu.models.dmpigo`.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from fourk_nerf_tpu.models import common, dmpigo
from fourk_nerf_tpu.ops import grid_sample, render, rays as ray_ops, vq


@dataclasses.dataclass(frozen=True)
class Config(dmpigo.Config):
    n_cluster: int = 4096  # codebook size (reference k0 world_size kwarg)

    @property
    def pe_dim(self) -> int:
        return 3 + 3 * self.spatial_pe * 2


def make_config(*args, n_cluster: int = 4096, **kwargs) -> Config:
    base = dmpigo.make_config(*args, **kwargs)
    return Config(**{f.name: getattr(base, f.name) for f in dataclasses.fields(dmpigo.Config)},
                  n_cluster=int(n_cluster))


def get_kwargs(cfg: Config) -> dict:
    kw = dmpigo.get_kwargs(cfg)
    kw["n_cluster"] = cfg.n_cluster
    return kw


def init(cfg: Config, key: jax.Array, init_mask=None):
    k1, k2, k3 = jax.random.split(key, 3)
    params, buffers = dmpigo.init(cfg, k1, init_mask=init_mask)
    params.pop("k0")  # replaced by the codebook
    vq_params, vq_state = vq.init_vq(k2, cfg.pe_dim, cfg.k0_dim, cfg.n_cluster)
    params["k0_vq"] = vq_params
    buffers["vq_state"] = vq_state
    if cfg.rgbnet_dim > 0:
        dims = [cfg.dim0] + [cfg.rgbnet_width] * (cfg.rgbnet_depth - 1) + [3]
        params["rgbnet"] = common.mlp_init(k3, dims)
    return params, buffers


def forward(cfg: Config, params: dict, buffers: dict, rays_o, rays_d, viewdirs, *,
            stepsize: float, bg: float = 0.0, rand_bkgd: bool = False,
            is_train: bool = False, render_depth: bool = False,
            key: jax.Array | None = None, **unused) -> dict[str, Any]:
    """(/root/reference/lib/dvqgo.py:279-408). When ``is_train``, the returned
    dict carries ``vq_state`` (updated EMA codebook) and ``vq_diff`` (the
    commitment loss term)."""
    N = rays_o.shape[0]
    K = cfg.n_samples(stepsize)
    xyz_min, xyz_max = dmpigo._xyz_minmax(cfg)
    interval = stepsize * cfg.voxel_size_ratio

    pts = render.sample_ndc_pts_on_rays(rays_o, rays_d, K)
    valid = jnp.all((pts >= xyz_min) & (pts <= xyz_max), axis=-1)
    valid &= grid_sample.nearest_mask_lookup(buffers["mask_cache"], pts, xyz_min, xyz_max)

    ind01 = grid_sample.world_to_ind01(pts, xyz_min, xyz_max)
    density = common.grid_query(cfg.density_type, params["density"], ind01)[..., 0]
    act_shift = grid_sample.trilinear_sample(buffers["act_shift"], ind01)[..., 0]
    alpha = render.raw2alpha(density + act_shift, 0.0, interval)
    if cfg.fast_color_thres > 0:
        valid &= alpha > cfg.fast_color_thres

    weights, alphainv_last, _T = render.alpha2weight(alpha, valid)
    if cfg.fast_color_thres > 0:
        weights = jnp.where(weights > cfg.fast_color_thres, weights, 0.0)

    pe_spa = ind01[..., ::-1] * 2.0 - 1.0
    pe_emb = ray_ops.positional_encoding(pe_spa, cfg.spatial_pe)
    vq_emb, vq_diff, _idx, vq_state = vq.vq_forward(
        params["k0_vq"], buffers["vq_state"], pe_emb, training=is_train
    )

    if cfg.rgbnet_dim <= 0:
        rgb_raw = jax.nn.sigmoid(vq_emb)
    else:
        vdir_emb = ray_ops.positional_encoding(viewdirs, cfg.viewbase_pe)
        vdir_emb = jnp.broadcast_to(vdir_emb[:, None, :], (N, K, vdir_emb.shape[-1]))
        rgb_feat = jnp.concatenate([vq_emb, pe_emb, vdir_emb], axis=-1)
        act = common.activation(cfg.act_type)
        rgb_raw = jax.nn.sigmoid(common.mlp_apply(params["rgbnet"], rgb_feat, act))

    rgb_marched = render.composite(weights, rgb_raw)
    if rand_bkgd and is_train:
        assert key is not None
        rgb_marched = rgb_marched + alphainv_last[:, None] * jax.random.uniform(
            key, rgb_marched.shape, dtype=rgb_marched.dtype
        )
    else:
        rgb_marched = rgb_marched + alphainv_last[:, None] * bg

    s = (jnp.arange(K, dtype=rgb_marched.dtype) + 0.5) / K
    s = jnp.broadcast_to(s[None, :], (N, K))

    out = {
        "alphainv_last": alphainv_last,
        "weights": weights,
        "rgb_marched": rgb_marched,
        # The reference's DirectQVGO has no dim_rend feature head / rend_layer
        # (/root/reference/lib/dvqgo.py renders 3-ch color only, unlike
        # dmpigo) -- so rgb_feature here is the marched color, and this model
        # cannot condition a dim_rend>3 SR decoder. Parity, not a gap.
        "rgb_feature": rgb_marched,
        "raw_alpha": jnp.where(valid, alpha, 0.0),
        "raw_rgb": rgb_raw,
        "n_max": K,
        "s": s,
        "vq_diff": vq_diff,
    }
    if is_train:
        out["vq_state"] = vq_state
    if render_depth:
        out["depth"] = jax.lax.stop_gradient(render.composite(weights, s))
    return out


# geometry maintenance is shared with dmpigo
update_occupancy_cache = dmpigo.update_occupancy_cache
decay_act_shift = dmpigo.decay_act_shift
density_tv_grad = dmpigo.density_tv_grad

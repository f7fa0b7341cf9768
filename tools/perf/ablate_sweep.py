#!/usr/bin/env python3
"""On-device ablation of the plane-sweep encoder at fern scale.

Times variants of the sweep body to localize the gap between the measured
~1.29 s/frame and the ~0.25 s roofline (ROADMAP.md). Each variant is one jit
signature; keep the list short (remote compiles are slow). Also captures a
jax.profiler trace of the full sweep into profile_r2/.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python /root/repo/tools/perf/ablate_sweep.py
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from fourk_nerf_tpu.models import common, dmpigo
from fourk_nerf_tpu.ops import plane_sweep, render, rays as ray_ops


def build_inputs():
    H, W = 756, 1008
    rng = np.random.default_rng(0)
    cfg = dmpigo.make_config(
        xyz_min=[-1.5, -1.67, -1.0], xyz_max=[1.5, 1.67, 1.0],
        num_voxels=384 * 384 * 256, mpi_depth=256,
        fast_color_thres=1.0 / 256 / 5, rgbnet_dim=9, rgbnet_depth=3, rgbnet_width=64,
    )
    params, buffers = dmpigo.init(cfg, jax.random.PRNGKey(0))
    params["density"] = jnp.asarray(
        rng.normal(-2.0, 2.0, params["density"].shape).astype(np.float32))
    buffers["mask_cache"] = jnp.asarray(
        rng.uniform(size=cfg.mask_cache_world_size) < 0.5)

    focal = 815.0
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]], dtype=np.float32)
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 1.0
    ro, rd, vd = ray_ops.get_rays_of_a_view(
        H, W, K, c2w[:3, :4], ndc=True, inverse_y=False, flip_x=False, flip_y=False)
    X, Y, Z = cfg.world_size
    sizes = jnp.asarray([X, Y], dtype=jnp.float32)
    a, b = plane_sweep._affine_coeffs(
        ro, rd, jnp.asarray(cfg.xyz_min), jnp.asarray(cfg.xyz_max), sizes, Z)

    tile = 32
    ph, pw = (-H) % tile, (-W) % tile
    pad2 = lambda x: jnp.pad(x, ((0, ph), (0, pw), (0, 0)), mode="edge")
    a_t, b_t, vd_t = pad2(a), pad2(b), pad2(vd)
    Ht, Wt = H + ph, W + pw
    nty, ntx = Ht // tile, Wt // tile

    def tiles_of(x):
        c = x.shape[-1]
        return (x.reshape(nty, tile, ntx, tile, c).transpose(0, 2, 1, 3, 4)
                .reshape(nty * ntx, tile * tile, c))

    return cfg, params, buffers, tiles_of(a_t), tiles_of(b_t), tiles_of(vd_t)


def sweep_variant(packed, act_shift, a_tiles, b_tiles, vd_tiles, mlp_params, *,
                  cfg, interval, patch: int, k0_dim: int, bg: float, act,
                  mode: str):
    """Variant of plane_sweep.sweep_all_tiles with ablation switches."""
    Z, X, Y, Cp = packed.shape
    T, R, _ = a_tiles.shape
    mm_dtype = jnp.bfloat16
    mlp_mm = jax.tree.map(lambda x: x.astype(mm_dtype), mlp_params)
    viewdir_emb = ray_ops.positional_encoding(vd_tiles, cfg.viewbase_pe)

    def body(carry, inp):
        t_cum, rgb_acc, depth_acc, alive = carry
        plane, shift_k, k = inp
        pos = a_tiles + b_tiles * k

        ox = jnp.clip(jnp.floor(jnp.min(pos[..., 0], axis=1)).astype(jnp.int32) - 1,
                      0, X - patch)
        oy = jnp.clip(jnp.floor(jnp.min(pos[..., 1], axis=1)).astype(jnp.int32) - 1,
                      0, Y - patch)
        if mode == "no_slice":
            patches = jnp.broadcast_to(
                jax.lax.dynamic_slice(plane, (0, 0, 0), (patch, patch, Cp)),
                (T, patch, patch, Cp))
        else:
            patches = jax.vmap(
                lambda x0, y0: jax.lax.dynamic_slice(plane, (x0, y0, 0),
                                                     (patch, patch, Cp))
            )(ox, oy)

        rel_x = pos[..., 0] - ox[:, None].astype(pos.dtype)
        rel_y = pos[..., 1] - oy[:, None].astype(pos.dtype)
        taps = jnp.arange(patch, dtype=pos.dtype)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(rel_x[..., None] - taps))
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(rel_y[..., None] - taps))

        if mode == "fused_w2d":
            w2d = (wx[..., :, None] * wy[..., None, :]).reshape(T, R, patch * patch)
            samp = jnp.einsum(
                "trm,tmc->trc", w2d.astype(mm_dtype),
                patches.reshape(T, patch * patch, Cp).astype(mm_dtype),
                preferred_element_type=jnp.float32)
        else:
            tmp = jnp.einsum("trp,tpqc->trqc", wx.astype(mm_dtype),
                             patches.astype(mm_dtype),
                             preferred_element_type=jnp.float32)
            if mode == "no_second":
                samp = tmp[:, :, 0, :]
            elif mode == "second_mxu":
                # second contraction as a batched MXU matmul [T*R,1,P]@[T*R,P,C]
                samp = jax.lax.dot_general(
                    wy.reshape(T * R, 1, patch).astype(mm_dtype),
                    tmp.reshape(T * R, patch, Cp).astype(mm_dtype),
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ).reshape(T, R, Cp)
            else:
                samp = jnp.einsum("trq,trqc->trc", wy, tmp)

        density = samp[..., 0]
        feat = samp[..., 1:1 + k0_dim]
        alpha = render.raw2alpha(density, shift_k, interval)
        inb = ((pos[..., 0] >= 0) & (pos[..., 0] <= X - 1)
               & (pos[..., 1] >= 0) & (pos[..., 1] <= Y - 1))
        alpha = jnp.where(inb, alpha, 0.0)
        if cfg.fast_color_thres > 0:
            alpha = jnp.where(alpha > cfg.fast_color_thres, alpha, 0.0)
        alpha = jnp.where(alive, alpha, 0.0)

        if mode == "no_mlp":
            rgb_raw = jax.nn.sigmoid(feat[..., :3])
        else:
            pe_spa = jnp.stack([
                jnp.full((T, R), 2.0 * k / (Z - 1) - 1.0, dtype=samp.dtype),
                pos[..., 1] / (Y - 1) * 2.0 - 1.0,
                pos[..., 0] / (X - 1) * 2.0 - 1.0,
            ], axis=-1)
            pe_emb = ray_ops.positional_encoding(pe_spa, cfg.spatial_pe)
            rgb_feat = jnp.concatenate([feat, pe_emb, viewdir_emb], axis=-1)
            rgb_raw = jax.nn.sigmoid(
                common.mlp_apply(mlp_mm, rgb_feat.astype(mm_dtype), act)
                .astype(jnp.float32))

        w = t_cum * alpha
        if cfg.fast_color_thres > 0:
            w = jnp.where(w > cfg.fast_color_thres, w, 0.0)
        rgb_acc = rgb_acc + w[..., None] * rgb_raw
        depth_acc = depth_acc + w * ((k + 0.5) / Z)
        t_new = t_cum * (1.0 - alpha)
        alive_new = alive & (t_new >= render.EARLY_TERM_THRES)
        return (t_new, rgb_acc, depth_acc, alive_new), None

    init = (jnp.ones((T, R), dtype=jnp.float32),
            jnp.zeros((T, R, 3), dtype=jnp.float32),
            jnp.zeros((T, R), dtype=jnp.float32),
            jnp.ones((T, R), dtype=bool))
    ks = jnp.arange(Z, dtype=jnp.float32)
    (t_cum, rgb_acc, depth_acc, _), _ = jax.lax.scan(
        body, init, (packed, act_shift, ks))
    return rgb_acc + t_cum[..., None] * bg, depth_acc, t_cum


@functools.partial(jax.jit, static_argnames=("cfg", "interval", "patch", "mode"))
def run_variant(cfg, params, buffers, a_tiles, b_tiles, vd_tiles, *,
                interval: float, patch: int, mode: str):
    packed, act_shift, _mask = plane_sweep.pack_grids(cfg, params, buffers)
    if mode == "bf16_grid":
        packed = packed.astype(jnp.bfloat16)
        mode = "base"
    act = common.activation(cfg.act_type)
    return sweep_variant(packed, act_shift, a_tiles, b_tiles, vd_tiles,
                         params["rgbnet"], cfg=cfg, interval=interval,
                         patch=patch, k0_dim=cfg.k0_dim, bg=1.0, act=act,
                         mode=mode)


def main():
    dev = jax.devices()[0]
    print("device:", dev.platform, dev.device_kind, flush=True)
    cfg, params, buffers, a_tiles, b_tiles, vd_tiles = build_inputs()
    interval = float(1.0 * cfg.voxel_size_ratio)
    results = {}
    modes = ["base", "second_mxu", "no_second", "no_mlp",
             "no_slice", "bf16_grid"]
    # NOTE: block_until_ready does NOT synchronize through the axon tunnel --
    # a host transfer is the only reliable fence. Timings therefore include
    # one small device->host copy of the [T,R,3] output (~9 MB).
    for mode in modes:
        t_compile0 = time.perf_counter()
        out = run_variant(cfg, params, buffers, a_tiles, b_tiles, vd_tiles,
                          interval=interval, patch=48, mode=mode)
        _ = np.asarray(out[0])
        compile_s = time.perf_counter() - t_compile0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = run_variant(cfg, params, buffers, a_tiles, b_tiles, vd_tiles,
                              interval=interval, patch=48, mode=mode)
            _ = np.asarray(out[0])
            ts.append(time.perf_counter() - t0)
        results[mode] = {"ms": round(float(np.median(ts)) * 1e3, 1),
                         "compile_s": round(compile_s, 1)}
        print(mode, results[mode], flush=True)

    # profiler trace of the production path
    import pathlib
    trace_dir = pathlib.Path("/root/repo/profile_r2")
    trace_dir.mkdir(exist_ok=True)
    try:
        with jax.profiler.trace(str(trace_dir)):
            out = run_variant(cfg, params, buffers, a_tiles, b_tiles, vd_tiles,
                              interval=interval, patch=48, mode="base")
            jax.block_until_ready(out)
        results["trace"] = "ok"
    except Exception as e:  # tunnel may not support profiling
        results["trace"] = f"failed: {e}"
    print(json.dumps(results), flush=True)
    with open(trace_dir / "ablation.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()

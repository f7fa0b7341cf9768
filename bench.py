#!/usr/bin/env python3
"""Benchmark: rays/sec through the flagship encoder forward (DirectMPIGO at
the LLFF fern fine-stage configuration) on the current accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` is measured against the BASELINE.json north star (>= 1 fps at
4K per chip): a 4K frame needs one 1008x756 encoder render (762k rays) plus
the 4x SR pass, so we report encoder rays/sec normalized by the 762k rays/
frame * 1 frame/sec encoder budget.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from fourk_nerf_tpu.models import dmpigo

    # fern fine-stage model shape (configs/llff/llff_default_lg.py):
    # 384x384x256 grid, 9-channel k0, stepsize 1.0 -> 256 samples/ray
    cfg = dmpigo.make_config(
        xyz_min=[-1.5, -1.67, -1.0], xyz_max=[1.5, 1.67, 1.0],
        num_voxels=384 * 384 * 256, mpi_depth=256,
        fast_color_thres=1.0 / 256 / 5, rgbnet_dim=9, rgbnet_depth=3, rgbnet_width=64,
    )
    params, buffers = dmpigo.init(cfg, jax.random.PRNGKey(0))
    # random-ish geometry so masks behave like mid-training (~half occupied)
    rng = np.random.default_rng(0)
    params["density"] = jnp.asarray(
        rng.normal(-2.0, 2.0, params["density"].shape).astype(np.float32)
    )
    mask = rng.uniform(size=cfg.mask_cache_world_size) < 0.5
    buffers["mask_cache"] = jnp.asarray(mask)

    n_rays = 8192  # reference eval chunk (run.py:108-116)
    rays_o = jnp.asarray(
        np.concatenate([rng.uniform(-0.5, 0.5, (n_rays, 2)), np.zeros((n_rays, 1))], -1),
        dtype=jnp.float32,
    )
    rays_d = jnp.asarray(
        np.concatenate([rng.uniform(-0.3, 0.3, (n_rays, 2)), np.ones((n_rays, 1))], -1),
        dtype=jnp.float32,
    )
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    @jax.jit
    def fwd(params, buffers, ro, rd, vd):
        out = dmpigo.forward(cfg, params, buffers, ro, rd, vd, stepsize=1.0, bg=1.0)
        return out["rgb_marched"], out["depth"] if "depth" in out else out["alphainv_last"]

    # warmup/compile
    jax.block_until_ready(fwd(params, buffers, rays_o, rays_d, viewdirs))

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, buffers, rays_o, rays_d, viewdirs)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    rays_per_sec = n_rays * iters / dt
    # north star: 1008*756 rays/frame at >= 1 fps
    frame_rays = 1008 * 756
    vs_baseline = rays_per_sec / frame_rays

    print(json.dumps({
        "metric": "encoder_render_rays_per_sec",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    main()

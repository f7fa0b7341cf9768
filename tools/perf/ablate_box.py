#!/usr/bin/env python3
"""On-device ablation of the bounded-scene slab sweep at lego scale.

Times ablated variants of the sweep body to localize the gap between the
measured ~5 s/frame and the ~1.5 s roofline estimate, plus a jax.profiler
trace of the full sweep into profile_r3/box/.

Run: PYTHONPATH=/root/repo python tools/perf/ablate_box.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp

from fourk_nerf_tpu.models import dvgo
from fourk_nerf_tpu.ops import box_sweep


def build_scene(grid=160, fill=0.15):
    cfg = dvgo.make_config(
        xyz_min=[-1.2, -1.2, -1.2], xyz_max=[1.2, 1.2, 1.2],
        num_voxels=grid**3, num_voxels_base=grid**3, alpha_init=1e-6,
        rgbnet_dim=12, rgbnet_width=128, rgbnet_depth=3,
        fast_color_thres=1e-4,
    )
    rng = np.random.default_rng(0)
    params, buffers = dvgo.init(cfg, jax.random.PRNGKey(0))
    X, Y, Z = cfg.world_size
    gx, gy, gz = np.meshgrid(np.linspace(-1, 1, X), np.linspace(-1, 1, Y),
                             np.linspace(-1, 1, Z), indexing="ij")
    blob = gx**2 + gy**2 + gz**2 < (3.0 * fill / (4.0 * np.pi) * 8.0) ** (2 / 3)
    dens = np.where(blob, rng.normal(15.0, 5.0, blob.shape), -6.0)
    params["density"] = jnp.asarray(dens[..., None].astype(np.float32))
    params["k0"] = jnp.asarray(
        rng.normal(0, 1, params["k0"].shape).astype(np.float32))
    buffers["mask_cache"] = jnp.asarray(blob)
    return cfg, params, buffers


def pose(ang):
    ax, ay = 0.5, ang
    Rx = np.array([[1, 0, 0], [0, np.cos(ax), -np.sin(ax)],
                   [0, np.sin(ax), np.cos(ax)]])
    Ry = np.array([[np.cos(ay), 0, np.sin(ay)], [0, 1, 0],
                   [-np.sin(ay), 0, np.cos(ay)]])
    R = (Ry @ Rx).astype(np.float32)
    c2w = np.eye(4, dtype=np.float32)[:3, :4]
    c2w[:3, :3] = R
    c2w[:3, 3] = R @ np.array([0, 0, 4.0], np.float32)
    return c2w


def main():
    cfg, params, buffers = build_scene()
    H = W = 800
    f = 0.9 * W
    Kc = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)

    def run(ablate, c2w, timers=None):
        out = box_sweep.render_frame_box(
            cfg, params, buffers, H, W, Kc, c2w, stepsize=0.5, near=0.2,
            bg=1.0, use_bf16=True, tile=16, timers=timers, _ablate=ablate)
        return float(np.asarray(out["rgb_marched"][0, 0, 0]))

    results = {}
    for ab in ("", "nomlp", "nomask", "fused", "nointerp"):
        t0 = time.time()
        run(ab, pose(0.1))
        compile_s = time.time() - t0
        ts = []
        for i in range(2):
            t0 = time.time()
            run(ab, pose(0.15 + 0.02 * i))
            ts.append(time.time() - t0)
        results[ab or "full"] = dict(compile_s=round(compile_s, 1),
                                     frame_ms=round(min(ts) * 1000))
        print(ab or "full", results[ab or "full"], flush=True)

    os.makedirs("profile_r3/box", exist_ok=True)
    with jax.profiler.trace("profile_r3/box"):
        run("", pose(0.2))
    with open("profile_r3/box/ablation.json", "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

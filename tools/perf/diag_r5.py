#!/usr/bin/env python3
"""Round-5 diagnostics for the two round-4 capture failures (VERDICT r4):

1. `render_frame_pallas(tile=None)` -> (8,512) raised JaxRuntimeError in the
   fresh-process driver capture at 756x1008 while the ablation driver timed
   the same tiling fine.  Reproduce fresh and capture the FULL traceback.
2. The trained-content anchor collapsed to 0.329 fps on the XLA sweep path
   (synthetic headline on the same path: 258.7 ms).  The XLA sweep is a
   fixed-work lax.scan, so content must not matter -- reproduce with
   per-iteration timings on both contents and both paths.

Run: timeout -k 10 2400 python tools/perf/diag_r5.py
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import numpy as np


def sync(x):
    return float(x.reshape(-1)[0])


def main():
    import jax
    import jax.numpy as jnp

    from fourk_nerf_tpu.models import dmpigo
    from fourk_nerf_tpu.ops import pallas_sweep, plane_sweep, rays as ray_ops

    print(f"devices: {jax.devices()}", flush=True)

    H, W = 756, 1008
    rng = np.random.default_rng(0)
    cfg = dmpigo.make_config(
        xyz_min=[-1.5, -1.67, -1.0], xyz_max=[1.5, 1.67, 1.0],
        num_voxels=384 * 384 * 256, mpi_depth=256,
        fast_color_thres=1.0 / 256 / 5, rgbnet_dim=9, rgbnet_depth=3,
        rgbnet_width=64)
    params, buffers = dmpigo.init(cfg, jax.random.PRNGKey(0))
    params["density"] = jnp.asarray(
        rng.normal(-2.0, 2.0, params["density"].shape).astype(np.float32))
    buffers["mask_cache"] = jnp.asarray(
        rng.uniform(size=cfg.mask_cache_world_size) < 0.5)

    focal = 815.0
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
                 dtype=np.float32)
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 1.0

    def time_path(name, fn, iters=5):
        try:
            t0 = time.perf_counter()
            out = fn()
            sync(out["rgb_feature"])
            print(f"[{name}] warmup+compile {time.perf_counter()-t0:.1f}s",
                  flush=True)
            ts = []
            for _ in range(iters):
                t0 = time.perf_counter()
                out = fn()
                sync(out["rgb_feature"])
                ts.append(time.perf_counter() - t0)
            print(f"[{name}] per-iter ms: "
                  + " ".join(f"{t*1e3:.1f}" for t in ts)
                  + f"  median {np.median(ts)*1e3:.1f}", flush=True)
            return float(np.median(ts))
        except Exception:
            print(f"[{name}] FAILED:", flush=True)
            traceback.print_exc()
            sys.stdout.flush()
            return None

    # --- step 1: fresh-process (8,512) pallas at production scale ---
    time_path("pallas-8x512-synth", lambda: pallas_sweep.render_frame_pallas(
        cfg, params, buffers, H, W, K, c2w[:3, :4], stepsize=1.0, bg=1.0,
        tile=(8, 512), patch=None, use_bf16=True, early_exit=True), iters=3)

    # --- step 2: (32,128) pallas, the pre-round-4 default ---
    time_path("pallas-32x128-synth", lambda: pallas_sweep.render_frame_pallas(
        cfg, params, buffers, H, W, K, c2w[:3, :4], stepsize=1.0, bg=1.0,
        tile=(32, 128), patch=None, use_bf16=True, early_exit=True), iters=3)

    # --- step 3: XLA sweep synthetic (the round-4 fallback headline) ---
    time_path("xla-sweep-synth", lambda: plane_sweep.render_frame(
        cfg, params, buffers, H, W, K, c2w[:3, :4], stepsize=1.0, bg=1.0,
        tile=32, patch=48), iters=5)

    # --- step 4: trained anchor content, same geometry ---
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "..", ".."))
    import bench
    anchor = bench.load_trained_fern_scale()
    if anchor is None:
        print("no trained ckpt; skipping anchor", flush=True)
        return
    tcfg, tparams, tbuffers = anchor
    print(f"trained cfg == synth cfg: {tcfg == cfg}", flush=True)
    if tcfg != cfg:
        import dataclasses
        for f in dataclasses.fields(cfg):
            a, b = getattr(cfg, f.name), getattr(tcfg, f.name)
            if a != b:
                print(f"  cfg diff {f.name}: synth={a} trained={b}",
                      flush=True)
    mc = np.asarray(tbuffers["mask_cache"])
    print(f"trained mask_cache shape {mc.shape} occupancy "
          f"{mc.mean():.4f}", flush=True)

    time_path("xla-sweep-trained", lambda: plane_sweep.render_frame(
        tcfg, tparams, tbuffers, H, W, K, c2w[:3, :4], stepsize=1.0, bg=1.0,
        tile=32, patch=48), iters=5)

    time_path("pallas-32x128-trained", lambda: pallas_sweep.render_frame_pallas(
        tcfg, tparams, tbuffers, H, W, K, c2w[:3, :4], stepsize=1.0, bg=1.0,
        tile=(32, 128), patch=None, use_bf16=True, early_exit=True), iters=3)

    time_path("pallas-8x512-trained", lambda: pallas_sweep.render_frame_pallas(
        tcfg, tparams, tbuffers, H, W, K, c2w[:3, :4], stepsize=1.0, bg=1.0,
        tile=(8, 512), patch=None, use_bf16=True, early_exit=True), iters=3)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Time the fused Pallas sweep at fern scale on the real TPU, vs the XLA
sweep baseline. Run: PYTHONPATH=/root/repo python tools/perf/bench_pallas.py"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from fourk_nerf_tpu.models import dmpigo
from fourk_nerf_tpu.ops import pallas_sweep, plane_sweep
from fourk_nerf_tpu.ops import rays as ray_ops


def main():
    dev = jax.devices()[0]
    print("device:", dev.platform, dev.device_kind, flush=True)
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
    c2w = np.eye(4, dtype=np.float32)[:3, :4]
    c2w[2, 3] = 1.0

    import os
    only = os.environ.get("BP_ONLY", "")
    variants = [
        ("base", dict(use_bf16=True, early_exit=True, tile=(32, 128), patch=None)),
        ("noee", dict(use_bf16=True, early_exit=False, tile=(32, 128), patch=None)),
        ("noy", dict(use_bf16=True, early_exit=False, tile=(32, 128), patch=None, ablate="noy")),
        ("nomlp", dict(use_bf16=True, early_exit=False, tile=(32, 128), patch=None, ablate="nomlp")),
        ("lok", dict(use_bf16=True, early_exit=False, tile=(32, 128), patch=None, ablate="lok")),
        ("minimal", dict(use_bf16=True, early_exit=False, tile=(32, 128), patch=None, ablate="lok,noy,nomask,nomlp")),
    ]
    for name, kw in variants:
        if only and only not in name:
            continue
        kw = dict(kw)
        patch = kw.pop("patch", None)
        tile = kw.pop("tile", (32, 128))
        try:
            def sync(o):
                # 1-element fetch: forces completion of the whole program
                # (block_until_ready under-reports on the tunneled remote
                # backend; a full np.asarray pulls ~9MB at ~2MB/s)
                return float(o["rgb_marched"][0, 0, 0])

            t0 = time.perf_counter()
            out = pallas_sweep.render_frame_pallas(
                cfg, params, buffers, H, W, K, c2w, stepsize=1.0, bg=1.0,
                tile=tile, patch=patch, **kw)
            sync(out)
            compile_s = time.perf_counter() - t0
            ts = []
            for _i in range(5):
                t0 = time.perf_counter()
                out = pallas_sweep.render_frame_pallas(
                    cfg, params, buffers, H, W, K, c2w, stepsize=1.0, bg=1.0,
                    tile=tile, patch=patch, **kw)
                sync(out)
                ts.append(time.perf_counter() - t0)
            print(name, {"ms": round(float(np.min(ts)) * 1e3, 1),
                         "med_ms": round(float(np.median(ts)) * 1e3, 1),
                         "compile_s": round(compile_s, 1)}, flush=True)
        except Exception as e:
            print(name, "FAILED:", repr(e)[:500], flush=True)

    # correctness spot-check vs XLA sweep on device (f32)
    try:
        outx = plane_sweep.render_frame(
            cfg, params, buffers, H, W, K, c2w, stepsize=1.0, bg=1.0,
            tile=32, patch=48, use_bf16=False)
        outp = pallas_sweep.render_frame_pallas(
            cfg, params, buffers, H, W, K, c2w, stepsize=1.0, bg=1.0,
            tile=32, patch=48, use_bf16=False, early_exit=True)
        d = np.abs(np.asarray(outx["rgb_marched"]) - np.asarray(outp["rgb_marched"]))
        print("max |pallas - xla| (f32):", float(d.max()), flush=True)
    except Exception as e:
        print("parity check FAILED:", repr(e)[:500], flush=True)


if __name__ == "__main__":
    main()

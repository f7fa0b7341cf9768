#!/usr/bin/env python3
"""Measure plane-granular sample compaction in the fused sweep encoder
(VERDICT r4 item 6): the kernel now skips the MLP + composite for any
(tile, plane) whose thresholded alpha is all-zero (ops/pallas_sweep.py,
mirroring the survivor compaction the reference CUDA path does dynamically,
/root/reference/lib/dmpigo.py:309-333). The win is content-dependent --
trained grids are sparse and front-loaded, random synthetic grids are not --
so this times default vs ``ablate="noskip"`` on BOTH the synthetic headline
grids and the trained med-checkpoint anchor grids (same geometry, bench.py's
two contents).

Run: bash tools/perf/tpu_run.sh tools/perf/bench_skip_empty.py /tmp/skip_empty.log
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax
import jax.numpy as jnp

from fourk_nerf_tpu.models import dmpigo
from fourk_nerf_tpu.ops import pallas_sweep


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    import bench

    H, W = 756, 1008
    focal = 815.0
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
                 dtype=np.float32)
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 1.0

    # synthetic headline content (bench.py's grids)
    rng = np.random.default_rng(0)
    cfg_s = dmpigo.make_config(
        xyz_min=[-1.5, -1.67, -1.0], xyz_max=[1.5, 1.67, 1.0],
        num_voxels=384 * 384 * 256, mpi_depth=256,
        fast_color_thres=1.0 / 256 / 5, rgbnet_dim=9, rgbnet_depth=3,
        rgbnet_width=64,
    )
    params_s, buffers_s = dmpigo.init(cfg_s, jax.random.PRNGKey(0))
    params_s["density"] = jnp.asarray(
        rng.normal(-2.0, 2.0, params_s["density"].shape).astype(np.float32))
    buffers_s["mask_cache"] = jnp.asarray(
        rng.uniform(size=cfg_s.mask_cache_world_size) < 0.5)

    contents = [("synthetic", cfg_s, params_s, buffers_s)]
    anchor = bench.load_trained_fern_scale()
    if anchor is not None:
        contents.append(("trained", *anchor))

    results = {}
    for name, cfg, params, buffers in contents:
        for variant, ablate in (("skip", ""), ("noskip", "noskip")):
            key = f"{name}_{variant}"
            try:
                f = lambda: pallas_sweep.render_frame_pallas(
                    cfg, params, buffers, H, W, K, c2w[:3, :4], stepsize=1.0,
                    bg=1.0, tile=(32, 128), use_bf16=True, early_exit=True,
                    ablate=ablate)
                out = f()
                float(np.asarray(out["rgb_feature"].reshape(-1)[0]))
                ts = []
                for _ in range(5):
                    t0 = time.perf_counter()
                    out = f()
                    float(np.asarray(out["rgb_feature"].reshape(-1)[0]))
                    ts.append(time.perf_counter() - t0)
                ms = float(np.min(ts)) * 1e3
                results[key] = round(ms, 1)
                print(f"{key:20s}: {ms:7.1f} ms (med {np.median(ts)*1e3:.1f})",
                      flush=True)
            except Exception as e:
                results[key] = f"FAILED {type(e).__name__}"
                print(f"{key:20s}: FAILED {repr(e)[:300]}", flush=True)

        # parity: skip vs noskip must be bit-identical in f32 composite
        try:
            o1 = pallas_sweep.render_frame_pallas(
                cfg, params, buffers, H, W, K, c2w[:3, :4], stepsize=1.0,
                bg=1.0, tile=(32, 128), use_bf16=True, early_exit=True)
            o2 = pallas_sweep.render_frame_pallas(
                cfg, params, buffers, H, W, K, c2w[:3, :4], stepsize=1.0,
                bg=1.0, tile=(32, 128), use_bf16=True, early_exit=True,
                ablate="noskip")
            d = float(jnp.max(jnp.abs(o1["rgb_feature"] - o2["rgb_feature"])))
            results[f"{name}_maxdiff"] = d
            print(f"{name} skip-vs-noskip max|diff| = {d:g}", flush=True)
        except Exception as e:
            results[f"{name}_maxdiff"] = f"FAILED {type(e).__name__}"
            print(f"{name} parity FAILED {repr(e)[:300]}", flush=True)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()

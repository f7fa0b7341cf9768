#!/usr/bin/env python3
"""In-kernel ablation of the fused Pallas plane-sweep encoder at the fern
benchmark configuration (VERDICT r3 item 7): the 240-270 ms kernel is ONE
opaque device event to the XLA trace (profile_r3/trace_analysis.md), so the
only way to localize its cost is to compile variants with pieces disabled
(the ``ablate`` hooks in ops/pallas_sweep.py) and re-time the frame.

Variants:
- component costs at the production tile: noy (y-contraction reduced to one
  tap), nomask (skip the nearest-mask path), nomlp (skip the rgbnet MLP),
  lok (x-interp matmul cut to K=8 -- keeps the DMA stream live);
- tile-shape sweep: the y-contraction is VPU-bound and scales with the
  per-plane y footprint (pys), which tracks TILE HEIGHT; wider/shorter
  tiles trade y-window work against x-window size (stripe DMA + MXU K dim).

Run: bash tools/perf/tpu_run.sh tools/perf/ablate_pallas_sweep.py /tmp/ablate_sweep.log
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from fourk_nerf_tpu.models import dmpigo
from fourk_nerf_tpu.ops import pallas_sweep


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)
    H, W = 756, 1008
    cfg = dmpigo.make_config(
        xyz_min=[-1.5, -1.67, -1.0], xyz_max=[1.5, 1.67, 1.0],
        num_voxels=384 * 384 * 256, mpi_depth=256,
        fast_color_thres=1.0 / 256 / 5, rgbnet_dim=9, rgbnet_depth=3,
        rgbnet_width=64,
    )
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

    results = {}

    def timeit(name, **kw):
        try:
            f = lambda: pallas_sweep.render_frame_pallas(
                cfg, params, buffers, H, W, K, c2w[:3, :4], stepsize=1.0,
                bg=1.0, use_bf16=True, early_exit=True, **kw)
            out = f()
            float(np.asarray(out["rgb_feature"].reshape(-1)[0]))
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                out = f()
                float(np.asarray(out["rgb_feature"].reshape(-1)[0]))
                ts.append(time.perf_counter() - t0)
            ms = float(np.min(ts)) * 1e3
            results[name] = round(ms, 1)
            print(f"{name:24s}: {ms:7.1f} ms (med {np.median(ts)*1e3:.1f})",
                  flush=True)
        except Exception as e:
            results[name] = f"FAILED {type(e).__name__}"
            print(f"{name:24s}: FAILED {repr(e)[:160]}", flush=True)

    # component ablations at the production tile (32, 128)
    timeit("base_32x128", tile=(32, 128))
    for ab in ("noy", "nomask", "nomlp", "lok", "noy+nomlp"):
        timeit(f"ablate_{ab}", tile=(32, 128), ablate=ab)

    # tile-shape sweep (R = th*tw rays/tile; pys tracks th, pxs tracks tw)
    for t in ((16, 128), (16, 256), (32, 256), (8, 256), (8, 512),
              (48, 128), (64, 128)):
        timeit(f"tile_{t[0]}x{t[1]}", tile=t)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()

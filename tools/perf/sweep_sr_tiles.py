#!/usr/bin/env python3
"""Sweep (th, tw) tile sizes for the fused SR dense-block kernel at fern
scale: the body runs ~3x its MXU floor and the residual is per-program
overhead (~60-90 us/instance across 15 calls x ny*nx tiles); bigger tiles
cut the instance count at the same math.  th=96 OOM'd VMEM in round 2 --
this sweeps the territory between.

Run: bash tools/perf/tpu_run.sh tools/perf/sweep_sr_tiles.py /tmp/sr_tiles.log
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from fourk_nerf_tpu.models import sr_esrnet
from fourk_nerf_tpu.ops import pallas_sr


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)
    H, W = 756, 1008
    sr_model = sr_esrnet.SFTNet(n_in_colors=3, scale=4, num_feat=64,
                                num_block=5, num_grow_ch=32, num_cond=1)
    sr_params = sr_model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3)),
        jnp.zeros((1, 16, 16, 1)))["params"]
    x = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32))
    c = jnp.asarray(rng.uniform(0, 1, (1, H, W, 1)).astype(np.float32))

    ref = None
    # tw must be % 16; ww = tw + 16 stays 16-aligned.  1008 = 16*63, so
    # tw in {144, 336} tile the fern width exactly (no pad columns); the
    # kernel needs Wq >= tw+16, so the widest viable tile is tw=512
    # (Wq=1024, 16 pad cols).
    for th, tw in ((48, 128), (64, 128), (80, 128),
                   (48, 144), (48, 336), (64, 336), (80, 336),
                   (40, 512), (48, 512), (64, 512)):
        try:
            f = jax.jit(lambda p, x_, c_, th=th, tw=tw:
                        pallas_sr.sftnet_apply_pallas(
                            p, x_, c_, scale=4, num_block=5, th=th, tw=tw))
            out = f(sr_params, x, c)
            float(np.asarray(out.reshape(-1)[0]))
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                out = f(sr_params, x, c)
                float(np.asarray(out.reshape(-1)[0]))
                ts.append(time.perf_counter() - t0)
            ms = float(np.min(ts)) * 1e3
            err = ""
            if ref is None:
                ref = np.asarray(out)
            else:
                d = np.abs(np.asarray(out) - ref)
                err = f"  p99.9 vs (48,128): {np.percentile(d, 99.9):.3g}"
            print(f"th={th:3d} tw={tw:3d}: {ms:7.1f} ms{err}", flush=True)
        except Exception as e:
            print(f"th={th:3d} tw={tw:3d}: FAILED {repr(e)[:200]}", flush=True)

    # whole-RRDB fusion at several tilings (5 kernel launches vs 15; the
    # 32-px fused halo favors bigger tiles)
    for th, tw in ((48, 128), (64, 128), (48, 336), (64, 336), (48, 512)):
        try:
            f = jax.jit(lambda p, x_, c_, th=th, tw=tw:
                        pallas_sr.sftnet_apply_pallas(
                            p, x_, c_, scale=4, num_block=5, th=th, tw=tw,
                            fuse_rrdb=True))
            out = f(sr_params, x, c)
            float(np.asarray(out.reshape(-1)[0]))
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                out = f(sr_params, x, c)
                float(np.asarray(out.reshape(-1)[0]))
                ts.append(time.perf_counter() - t0)
            d = np.abs(np.asarray(out) - ref)
            print(f"FUSED th={th:3d} tw={tw:3d}: {np.min(ts)*1e3:7.1f} ms  "
                  f"p99.9 vs base: {np.percentile(d, 99.9):.3g}", flush=True)
        except Exception as e:
            print(f"FUSED th={th:3d} tw={tw:3d}: FAILED {repr(e)[:200]}",
                  flush=True)

    # upchain variant at the baseline tiling (ops/s2d.py::conv_up_dilated)
    for up in ("materialized", "dilated"):
        try:
            f = jax.jit(lambda p, x_, c_, up=up: pallas_sr.sftnet_apply_pallas(
                p, x_, c_, scale=4, num_block=5, th=48, tw=128, upchain=up))
            out = f(sr_params, x, c)
            float(np.asarray(out.reshape(-1)[0]))
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                out = f(sr_params, x, c)
                float(np.asarray(out.reshape(-1)[0]))
                ts.append(time.perf_counter() - t0)
            d = np.abs(np.asarray(out) - ref)
            print(f"upchain={up}: {np.min(ts)*1e3:7.1f} ms  "
                  f"p99.9 vs base: {np.percentile(d, 99.9):.3g}", flush=True)
        except Exception as e:
            print(f"upchain={up}: FAILED {repr(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Focused SR decode variant timing at fern scale (round-4 follow-up to
sweep_sr_tiles.py): the full sweep showed tile size is a wash (331-337 ms
for every tiling that compiles; th>=64 or tw>=336 hang/fail the Mosaic
compile), so this measures only the two levers with a mechanism behind
them -- whole-RRDB fusion (1/3 the body HBM round trips) and the exact
lhs-dilated upchain (no materialized nearest-up tensors) -- alone and
combined, plus parity vs the production tiling.

Run: bash tools/perf/tpu_run.sh tools/perf/sweep_sr_focused.py /tmp/sr_focused.log
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
    for name, kw in (
        ("base 48x128", dict(th=48, tw=128)),
        ("fused 48x128", dict(th=48, tw=128, fuse_rrdb=True)),
        ("dilated-up 48x128", dict(th=48, tw=128, upchain="dilated")),
        ("fused+dilated 48x128", dict(th=48, tw=128, fuse_rrdb=True,
                                      upchain="dilated")),
        ("fused+dilated 48x144", dict(th=48, tw=144, fuse_rrdb=True,
                                      upchain="dilated")),
    ):
        try:
            f = jax.jit(lambda p, x_, c_, kw=kw: pallas_sr.sftnet_apply_pallas(
                p, x_, c_, scale=4, num_block=5, **kw))
            out = f(sr_params, x, c)
            float(np.asarray(out.reshape(-1)[0]))
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                out = f(sr_params, x, c)
                float(np.asarray(out.reshape(-1)[0]))
                ts.append(time.perf_counter() - t0)
            err = ""
            if ref is None:
                ref = out  # keep on device; the tunnel is ~2 MB/s
            else:
                d = jax.jit(lambda a, b: jnp.max(jnp.abs(a - b)))(out, ref)
                err = f"  max vs base: {float(np.asarray(d)):.3g}"
            print(f"{name:22s}: {np.min(ts)*1e3:7.1f} ms{err}", flush=True)
        except Exception as e:
            print(f"{name:22s}: FAILED {repr(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()

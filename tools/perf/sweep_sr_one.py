#!/usr/bin/env python3
"""Time ONE SR decode variant at fern scale (argv-selected) -- the
per-variant split of sweep_sr_focused.py: the whole-RRDB fused kernel's
Mosaic compile through the remote tpu_compile_helper ran >16 min without
finishing (r4), so each variant gets its own bounded process instead of
one sweep that a hanging compile can block.

Usage: python tools/perf/sweep_sr_one.py <base|fused|dilated|fused_dilated>
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from fourk_nerf_tpu.models import sr_esrnet
from fourk_nerf_tpu.ops import pallas_sr

VARIANTS = {
    "base": dict(th=48, tw=128),
    "fused": dict(th=48, tw=128, fuse_rrdb=True),
    "dilated": dict(th=48, tw=128, upchain="dilated"),
    "fused_dilated": dict(th=48, tw=128, fuse_rrdb=True, upchain="dilated"),
    # in-kernel cost localization on top of the adopted dilated upchain
    # (round-5, VERDICT item 5): bf16 partial-sum accumulation, SFT layers
    # disabled, frame-edge masking disabled. bf16acc is a candidate
    # adoption (numerics quantified before flipping); nosft/nomask are
    # measurement-only.
    "dilated_bf16acc": dict(th=48, tw=128, upchain="dilated",
                            ablate="bf16acc"),
    "dilated_nosft": dict(th=48, tw=128, upchain="dilated", ablate="nosft"),
    "dilated_nomask": dict(th=48, tw=128, upchain="dilated",
                           ablate="nomask"),
}


def main():
    name = sys.argv[1]
    kw = VARIANTS[name]
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

    f = jax.jit(lambda p, x_, c_: pallas_sr.sftnet_apply_pallas(
        p, x_, c_, scale=4, num_block=5, **kw))
    t0 = time.perf_counter()
    out = f(sr_params, x, c)
    float(np.asarray(out.reshape(-1)[0]))
    print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s", flush=True)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = f(sr_params, x, c)
        float(np.asarray(out.reshape(-1)[0]))
        ts.append(time.perf_counter() - t0)
    # cheap on-device checksum for cross-variant sanity (tunnel is ~2 MB/s)
    s = jax.jit(lambda o: jnp.mean(jnp.abs(o)))(out)
    print(f"{name}: {np.min(ts)*1e3:7.1f} ms  mean|out|={float(np.asarray(s)):.6f}",
          flush=True)


if __name__ == "__main__":
    main()

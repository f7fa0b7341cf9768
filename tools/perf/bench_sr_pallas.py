#!/usr/bin/env python3
"""Time the Pallas fused SFTNet decode vs the XLA bf16 path at fern scale.
Run: bash tools/perf/tpu_run.sh tools/perf/bench_sr_pallas.py /tmp/srp.log"""
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp

from fourk_nerf_tpu.models import sr_esrnet
from fourk_nerf_tpu.ops import pallas_sr, s2d


def timeit(name, fn, *args, reps=5):
    try:
        out = fn(*args)
        float(np.asarray(out.reshape(-1)[0]))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            float(np.asarray(out.reshape(-1)[0]))
            ts.append(time.perf_counter() - t0)
        print(f"{name}: {np.min(ts)*1e3:.1f} ms (med {np.median(ts)*1e3:.1f})",
              flush=True)
    except Exception as e:
        print(f"{name}: FAILED {repr(e)[:400]}", flush=True)


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    H, W, s = 756, 1008, 4
    model = sr_esrnet.SFTNet(n_in_colors=3, scale=s, num_feat=64,
                             num_block=5, num_grow_ch=32, num_cond=1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                        jnp.zeros((1, 64, 64, 1)))["params"]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, H, W, 3)).astype(np.float32))
    cond = jnp.asarray(rng.normal(size=(1, H, W, 1)).astype(np.float32))

    for th, tw in ((48, 128), (96, 128)):
        fp = jax.jit(lambda p, a, c, th=th, tw=tw:
                     pallas_sr.sftnet_apply_pallas(p, a, c, scale=s,
                                                   num_block=5, th=th, tw=tw))
        timeit(f"pallas_v2 th={th} tw={tw}", fp, params, x, cond)

    @jax.jit
    def full_bf16(p, a, c):
        return sr_esrnet.apply_bf16(model, p, a, c)
    timeit("xla_bf16", full_bf16, params, x, cond)

    # on-device correctness spot check of the s2d fast path
    xs, cs = x[:, :96, :96], cond[:, :96, :96]
    ref = sr_esrnet.apply_bf16(model, params, xs, cs)
    got = pallas_sr.sftnet_apply_pallas(params, xs, cs, scale=s, num_block=5,
                                        th=48, tw=96)
    print("max|pallasv2-xla_bf16| (96x96):",
          float(jnp.max(jnp.abs(got - ref))), flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Time the SFTNet x4 upsample chain variants at fern scale.

The upchain (conv_up1 @2x, conv_up2 @4x, conv_hr, conv_last) costs ~97 ms
vs a ~40 ms bandwidth floor.  The production path materializes the
nearest-up2 tensor before each conv (an extra full-resolution HBM pass);
``s2d.conv_up_dilated`` folds the 2x2 smear into a 4x4 ``lhs_dilation=2``
kernel (exact) so the conv reads the 1x-res input directly.  The
phase-decomposed form is re-measured for completeness (round 2: loses to
pixel-shuffle relayouts).

Run: bash tools/perf/tpu_run.sh tools/perf/bench_upchain.py /tmp/upchain.log
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from fourk_nerf_tpu.ops import s2d


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
        print(f"{name}: {np.min(ts)*1e3:7.1f} ms (med {np.median(ts)*1e3:.1f})",
              flush=True)
        return out
    except Exception as e:
        print(f"{name}: FAILED {repr(e)[:200]}", flush=True)
        return None


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)
    H, W, F = 756, 1008, 64
    bf = jnp.bfloat16
    x = jnp.asarray(rng.normal(size=(1, H, W, F)).astype(np.float32)).astype(bf)
    k1 = jnp.asarray(rng.normal(size=(3, 3, F, F)).astype(np.float32) * 0.05).astype(bf)
    k2 = jnp.asarray(rng.normal(size=(3, 3, F, F)).astype(np.float32) * 0.05).astype(bf)
    kh = jnp.asarray(rng.normal(size=(3, 3, F, F)).astype(np.float32) * 0.05).astype(bf)
    kl = jnp.asarray(rng.normal(size=(3, 3, F, 3)).astype(np.float32) * 0.05).astype(bf)
    b = jnp.zeros((F,), bf)
    b3 = jnp.zeros((3,), jnp.float32)

    def conv(a, k, pet=jnp.float32):
        return jax.lax.conv_general_dilated(
            a, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=pet)

    def lrelu(a):
        return jnp.where(a >= 0, a, 0.2 * a)

    def up2(a):
        return jnp.repeat(jnp.repeat(a, 2, axis=1), 2, axis=2)

    @jax.jit
    def chain_materialized(x):
        y = lrelu((conv(up2(x), k1) + b).astype(bf))
        y = lrelu((conv(up2(y), k2) + b).astype(bf))
        y = lrelu((conv(y, kh) + b).astype(bf))
        return conv(y, kl, jnp.float32) + b3

    @jax.jit
    def chain_dilated(x):
        y = lrelu(s2d.conv_up_dilated(x, k1, b))
        y = lrelu(s2d.conv_up_dilated(y, k2, b))
        y = lrelu((conv(y, kh) + b).astype(bf))
        return conv(y, kl, jnp.float32) + b3

    @jax.jit
    def chain_phase(x):
        y = lrelu(s2d.conv_up_phase(x, k1, b))
        y = lrelu(s2d.conv_up_phase(y, k2, b))
        y = lrelu((conv(y, kh) + b).astype(bf))
        return conv(y, kl, jnp.float32) + b3

    ref = timeit("materialized (production)", chain_materialized, x)
    got = timeit("lhs-dilated 4x4", chain_dilated, x)
    if ref is not None and got is not None:
        d = np.abs(np.asarray(got, np.float32) - np.asarray(ref, np.float32))
        print(f"  dilated vs materialized p99.9: {np.percentile(d, 99.9):.3g}",
              flush=True)
    timeit("phase-decomposed", chain_phase, x)


if __name__ == "__main__":
    main()

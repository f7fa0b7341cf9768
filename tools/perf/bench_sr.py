#!/usr/bin/env python3
"""Time SFTNet x4 decode components at fern scale (1008x756 -> 4032x3024).
Run: bash tools/perf/tpu_run.sh tools/perf/bench_sr.py /tmp/sr.log"""
import time
import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from fourk_nerf_tpu.models import sr_esrnet


def timeit(name, fn, *args, reps=5):
    try:
        out = fn(*args)
        float(np.asarray(out.reshape(-1)[0]))  # sync
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            float(np.asarray(out.reshape(-1)[0]))
            ts.append(time.perf_counter() - t0)
        print(f"{name}: {np.min(ts)*1e3:.1f} ms (med {np.median(ts)*1e3:.1f})",
              flush=True)
    except Exception as e:
        print(f"{name}: FAILED {repr(e)[:300]}", flush=True)


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    H, W, s = 756, 1008, 4
    model = sr_esrnet.SFTNet(n_in_colors=3, scale=s, num_feat=64,
                             num_block=5, num_grow_ch=32, num_cond=1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                        jnp.zeros((1, 64, 64, 1)))["params"]
    x = jnp.zeros((1, H, W, 3))
    cond = jnp.zeros((1, H, W, 1))

    @jax.jit
    def full_bf16(p, x, c):
        return sr_esrnet.apply_bf16(model, p, x, c)

    @jax.jit
    def full_f32(p, x, c):
        return model.apply({"params": p}, x, c)

    timeit("sft_full_bf16", full_bf16, params, x, cond)
    timeit("sft_full_f32", full_f32, params, x, cond)

    # body-only: 5 RRDBSFT blocks at LR resolution, bf16
    feat = jnp.zeros((1, H, W, 64), jnp.bfloat16)
    c32 = jnp.zeros((1, H, W, 32), jnp.bfloat16)
    blocks = [sr_esrnet.RRDBSFT(64, 32) for _ in range(5)]
    bparams = [b.init(jax.random.PRNGKey(i), feat, c32)["params"]
               for i, b in enumerate(blocks)]
    bparams = jax.tree.map(lambda v: v.astype(jnp.bfloat16), bparams)

    @jax.jit
    def body_only(ps, f, c):
        for b, p in zip(blocks, ps):
            f = b.apply({"params": p}, f, c)
        return f
    timeit("body5_bf16", body_only, bparams, feat, c32)

    # upsample chain only (2 up convs + hr + last at 2x/4x res), bf16
    up1 = nn.Conv(64, (3, 3))
    vu1 = jax.tree.map(lambda v: v.astype(jnp.bfloat16),
                       up1.init(jax.random.PRNGKey(9), feat)["params"])

    @jax.jit
    def upchain(p, f):
        b = sr_esrnet._nearest_up2(f)
        b = nn.leaky_relu(up1.apply({"params": p}, b), negative_slope=0.2)
        b = sr_esrnet._nearest_up2(b)
        b = nn.leaky_relu(up1.apply({"params": p}, b), negative_slope=0.2)
        b = nn.leaky_relu(up1.apply({"params": p}, b), negative_slope=0.2)
        return b
    timeit("upchain_bf16", upchain, vu1, feat)


if __name__ == "__main__":
    main()

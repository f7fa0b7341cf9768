#!/usr/bin/env python3
"""Micro-time individual SR ops at LR (1008x756) to find the conv
inefficiency. Run via tools/perf/tpu_run.sh."""
import time
import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


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
        print(f"{name}: {np.min(ts)*1e3:.2f} ms", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {repr(e)[:200]}", flush=True)


def conv_fn(cin, cout, k):
    m = nn.Conv(cout, (k, k))
    p = jax.tree.map(lambda v: v.astype(jnp.bfloat16),
                     m.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 8, 8, cin), jnp.bfloat16))["params"])

    @jax.jit
    def f(x):
        return m.apply({"params": p}, x)
    return f


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    H, W = 756, 1008
    for cin, cout, k, tag in [(64, 64, 3, "c64->64 3x3"),
                              (64, 32, 3, "c64->32 3x3"),
                              (192, 32, 3, "c192->32 3x3"),
                              (224, 64, 3, "c224->64 3x3"),
                              (32, 64, 1, "c32->64 1x1"),
                              (64, 128, 3, "c64->128 3x3"),
                              (128, 128, 3, "c128->128 3x3")]:
        x = jnp.zeros((1, H, W, cin), jnp.bfloat16)
        gf = H * W * cin * cout * k * k * 2 / 1e9
        f = conv_fn(cin, cout, k)
        t0 = None
        try:
            out = f(x)
            float(np.asarray(out.reshape(-1)[0]))
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                out = f(x)
                float(np.asarray(out.reshape(-1)[0]))
                ts.append(time.perf_counter() - t0)
            ms = np.min(ts) * 1e3
            print(f"{tag}: {ms:.2f} ms ({gf/ms:.1f} TF/s eff)", flush=True)
        except Exception as e:
            print(f"{tag}: FAILED {repr(e)[:200]}", flush=True)

    # concat cost
    xs = [jnp.zeros((1, H, W, c), jnp.bfloat16) for c in (64, 32, 32, 32)]

    @jax.jit
    def cat(*a):
        return jnp.concatenate(a, -1) * 1.5
    timeit("concat(64+32x3)+mul", cat, *xs)

    # one full RDB-equivalent as a chain
    from fourk_nerf_tpu.models import sr_esrnet
    rdb = sr_esrnet.ResidualDenseBlockSFT(64, 32)
    x = jnp.zeros((1, H, W, 64), jnp.bfloat16)
    c = jnp.zeros((1, H, W, 32), jnp.bfloat16)
    p = jax.tree.map(lambda v: v.astype(jnp.bfloat16),
                     rdb.init(jax.random.PRNGKey(0), x, c)["params"])

    @jax.jit
    def one_rdb(x, c):
        return rdb.apply({"params": p}, x, c)
    timeit("one_rdbsft", one_rdb, x, c)


if __name__ == "__main__":
    main()

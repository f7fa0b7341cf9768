#!/usr/bin/env python3
"""Loop-timed SR micro-bench: run each op N times inside ONE dispatch so the
~35ms tunnel round trip per sync doesn't contaminate per-op numbers."""
import time
import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

N = 10


def loop_time(name, make_fn, x, gf_per_iter=None):
    f = make_fn()

    @jax.jit
    def run(x):
        def body(i, acc):
            return f(acc)
        return jax.lax.fori_loop(0, N, body, x)

    try:
        out = run(x)
        float(np.asarray(out.reshape(-1)[0]))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(x)
            float(np.asarray(out.reshape(-1)[0]))
            ts.append(time.perf_counter() - t0)
        total = float(np.min(ts))
        per = (total - 0.035) / N * 1e3  # subtract ~1 RTT
        msg = f"{name}: {per:.2f} ms/op"
        if gf_per_iter:
            msg += f" ({gf_per_iter/per:.1f} TF/s eff)"
        print(msg, flush=True)
    except Exception as e:
        print(f"{name}: FAILED {repr(e)[:200]}", flush=True)


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    H, W, C = 756, 1008, 64
    x = jnp.zeros((1, H, W, C), jnp.bfloat16)
    gf = H * W * C * C * 9 * 2 / 1e9

    def mk_conv():
        m = nn.Conv(C, (3, 3))
        p = jax.tree.map(lambda v: v.astype(jnp.bfloat16),
                         m.init(jax.random.PRNGKey(0), x)["params"])
        return lambda a: m.apply({"params": p}, a)
    loop_time("conv3x3 64->64 (lax.conv)", mk_conv, x, gf)

    # shifted-matmul formulation: y = sum_taps shift(x) @ W[tap]
    def mk_shift():
        w = jnp.zeros((9, C, C), jnp.bfloat16)

        def f(a):
            am = a[0]  # [H,W,C]
            out = jnp.zeros((H, W, C), jnp.float32)
            pad = jnp.pad(am, ((1, 1), (1, 1), (0, 0)))
            t = 0
            for dy in (0, 1, 2):
                for dx in (0, 1, 2):
                    sh = jax.lax.dynamic_slice(pad, (dy, dx, 0), (H, W, C))
                    out = out + jax.lax.dot_general(
                        sh.reshape(H * W, C), w[t],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32).reshape(H, W, C)
                    t += 1
            return out.astype(jnp.bfloat16)[None]
        return f
    loop_time("conv3x3 64->64 (9 shifted matmuls)", mk_shift, x, gf)

    # im2col single matmul
    def mk_im2col():
        w = jnp.zeros((9 * C, C), jnp.bfloat16)

        def f(a):
            am = a[0]
            pad = jnp.pad(am, ((1, 1), (1, 1), (0, 0)))
            cols = jnp.concatenate(
                [jax.lax.dynamic_slice(pad, (dy, dx, 0), (H, W, C))
                 for dy in (0, 1, 2) for dx in (0, 1, 2)], axis=-1)
            out = jax.lax.dot_general(
                cols.reshape(H * W, 9 * C), w,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return out.reshape(1, H, W, C).astype(jnp.bfloat16)
        return f
    loop_time("conv3x3 64->64 (im2col matmul)", mk_im2col, x, gf)

    # pure matmul reference [H*W, 64] @ [64, 64]
    def mk_mm():
        w = jnp.zeros((C, C), jnp.bfloat16)

        def f(a):
            out = jax.lax.dot_general(
                a.reshape(H * W, C), w,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return out.reshape(1, H, W, C).astype(jnp.bfloat16)
        return f
    loop_time("matmul [HW,64]@[64,64]", mk_mm, x, gf / 9)

    # f32 conv for comparison
    xf = jnp.zeros((1, H, W, C), jnp.float32)

    def mk_conv32():
        m = nn.Conv(C, (3, 3))
        p = m.init(jax.random.PRNGKey(0), xf)["params"]
        return lambda a: m.apply({"params": p}, a)
    loop_time("conv3x3 64->64 f32", mk_conv32, xf, gf)


if __name__ == "__main__":
    main()

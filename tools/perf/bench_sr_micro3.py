#!/usr/bin/env python3
"""Candidate conv reformulations for the SFTNet body: find a shape XLA maps
well onto the v5e MXU. All candidates compute work equivalent to a 3x3
conv 64->64 over 756x1008 (56.5 GFLOP definitional)."""
import time
import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

N = 10
H, W, C = 756, 1008, 64
GF_DEF = H * W * C * C * 9 * 2 / 1e9  # definitional work


def loop_time(name, f, x, gf_actual=None):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, N, lambda i, a: f(a), x)

    try:
        out = run(x)
        float(np.asarray(out.reshape(-1)[0]))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(x)
            float(np.asarray(out.reshape(-1)[0]))
            ts.append(time.perf_counter() - t0)
        per = (float(np.min(ts)) - 0.035) / N * 1e3
        msg = f"{name}: {per:.2f} ms/op ({GF_DEF/per:.1f} TF/s definitional"
        if gf_actual:
            msg += f", {gf_actual/per:.1f} TF/s actual"
        print(msg + ")", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {repr(e)[:200]}", flush=True)


def conv(cin, cout, k, Hs, Ws, gf=None, name=None, batch=1):
    x = jnp.zeros((batch, Hs, Ws, cin), jnp.bfloat16)
    m = nn.Conv(cout, (k, k))
    p = jax.tree.map(lambda v: v.astype(jnp.bfloat16),
                     m.init(jax.random.PRNGKey(0), x)["params"])
    gfa = batch * Hs * Ws * cin * cout * k * k * 2 / 1e9
    loop_time(name or f"conv{k}x{k} {cin}->{cout} @{batch}x{Hs}x{Ws}",
              lambda a: m.apply({"params": p}, a), x, gfa)


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    # baseline
    conv(64, 64, 3, H, W)
    # s2d(2): same tensor as 378x504x256; 2x2 conv covers the 3x3 rf
    conv(256, 256, 2, H // 2, W // 2)
    # s2d(2) but 3x3 kernel (covers 5/6 rf — upper bound shape test)
    conv(256, 256, 3, H // 2, W // 2)
    # s2d(4): 189x252x1024, 2x2 kernel
    conv(1024, 1024, 2, H // 4, W // 4)
    # wider channels at full res
    conv(128, 128, 3, H, W)
    conv(256, 256, 3, H, W)
    # wide-out (fused dense group j=0 shape)
    conv(64, 192, 3, H, W)
    conv(64, 64, 3, 252, 252, batch=12, name="conv3x3 64->64 12x252x252 tiles")
    # 1x1 big matmul reference (pure MXU, contraction 576)
    x = jnp.zeros((H * W, 576), jnp.bfloat16)
    w = jnp.zeros((576, 64), jnp.bfloat16)
    loop_time("matmul [HW,576]@[576,64]",
              lambda a: jax.lax.dot_general(
                  a, w, (((1,), (0,)), ((), ())),
                  preferred_element_type=jnp.float32).astype(jnp.bfloat16)
              @ jnp.zeros((64, 576), jnp.bfloat16), x, GF_DEF * 2 / 9 * 9)
    # HBM copy floor
    big = jnp.zeros((1, H, W, 64), jnp.bfloat16)
    loop_time("copy 97MB (x+1)", lambda a: a + 1, big)


if __name__ == "__main__":
    main()

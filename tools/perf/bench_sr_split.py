#!/usr/bin/env python3
"""Split the SR decode wall: bare Pallas body (15 calls) vs upchain vs head,
plus kernel ablations, at fern scale."""
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
        print(f"{name}: FAILED {repr(e)[:300]}", flush=True)


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    H, W, th, tw = 756, 1008, 48, 128
    rng = np.random.default_rng(0)
    model = sr_esrnet.SFTNet(n_in_colors=3, scale=4, num_feat=64,
                             num_block=5, num_grow_ch=32, num_cond=1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                        jnp.zeros((1, 64, 64, 1)))["params"]
    ny, nx = -(-H // th), -(-W // tw)
    Hq, Wq = ny * th, nx * tw
    body0 = jnp.asarray(rng.normal(size=(Hq, Wq, 128)).astype(np.float32),
                        jnp.bfloat16)

    def body15(b, ablate=""):
        for i in range(5):
            bp = params[f"body{i}"]
            xin = b
            for j in (1, 2):
                b = pallas_sr.rdb_apply_pallas(
                    b, pallas_sr.pack_rdb_weights(bp[f"rdb{j}"]),
                    H=H, W=W, th=th, tw=tw, ablate=ablate)
            b = pallas_sr.rdb_apply_pallas(
                b, pallas_sr.pack_rdb_weights(bp["rdb3"],
                                              rrdb_sft=bp["sft0"]),
                H=H, W=W, th=th, tw=tw, xin=xin, ablate=ablate)
        return b

    timeit("body15", jax.jit(lambda b: body15(b)), body0)
    timeit("body15_bf16acc", jax.jit(lambda b: body15(b, "bf16acc")), body0)
    for th2, tw2 in ():
        ny2, nx2 = -(-H // th2), -(-W // tw2)
        b2 = jnp.asarray(rng.normal(size=(ny2 * th2, nx2 * tw2, 128))
                         .astype(np.float32), jnp.bfloat16)

        def bodyv(b, th2=th2, tw2=tw2):
            for i in range(5):
                bp = params[f"body{i}"]
                xin = b
                for j in (1, 2):
                    b = pallas_sr.rdb_apply_pallas(
                        b, pallas_sr.pack_rdb_weights(bp[f"rdb{j}"]),
                        H=H, W=W, th=th2, tw=tw2)
                b = pallas_sr.rdb_apply_pallas(
                    b, pallas_sr.pack_rdb_weights(bp["rdb3"],
                                                  rrdb_sft=bp["sft0"]),
                    H=H, W=W, th=th2, tw=tw2, xin=xin)
            return b
        timeit(f"body15_t{th2}x{tw2}", jax.jit(bodyv), b2)
    timeit("full_pallas", jax.jit(lambda p, a, c: pallas_sr.sftnet_apply_pallas(
        p, a, c, scale=4, num_block=5, th=th, tw=tw)), params,
        jnp.zeros((1, H, W, 3)), jnp.zeros((1, H, W, 1)))

    # upchain only: conv_up1 .. conv_last from a 756x1008x64 feature map
    bf = jnp.bfloat16
    feat = body0[None, :H, :W, :64]

    @jax.jit
    def upchain(f):
        b = pallas_sr._lrelu(s2d.conv_up_phase(
            f, jnp.asarray(params["conv_up1"]["kernel"], bf),
            jnp.asarray(params["conv_up1"]["bias"], bf)))
        b = pallas_sr._lrelu(s2d.conv_up_phase(
            b, jnp.asarray(params["conv_up2"]["kernel"], bf),
            jnp.asarray(params["conv_up2"]["bias"], bf)))
        out = pallas_sr._lrelu(pallas_sr._conv(params["conv_hr"], b))
        return pallas_sr._conv(params["conv_last"], out)
    timeit("upchain_phase", upchain, feat)

    @jax.jit
    def upchain_naive(f):
        def up2(a):
            return jnp.repeat(jnp.repeat(a, 2, axis=1), 2, axis=2)
        b = pallas_sr._lrelu(pallas_sr._conv(params["conv_up1"], up2(f)))
        b = pallas_sr._lrelu(pallas_sr._conv(params["conv_up2"], up2(b)))
        out = pallas_sr._lrelu(pallas_sr._conv(params["conv_hr"], b))
        return pallas_sr._conv(params["conv_last"], out)
    timeit("upchain_naive", upchain_naive, feat)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Isolate the per-iteration floor of the sweep kernel: time a series of
minimal kernels with the fern-scale iteration structure (Z=256 planes x
T=768 tiles) adding one suspect at a time.

Run: bash tools/perf/tpu_run.sh tools/perf/probe_floor.py /tmp/floor.log
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Z, T, G = 256, 768, 24
nG = T // G
Xp, L = 392, 6144          # stripe rows x lanes (Yp*Cp), bf16
pxs, pw = 56, 896           # per-tile window
R = 1024


def timeit(name, fn, *args):
    try:
        out = jax.block_until_ready(fn(*args))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            ts.append(time.perf_counter() - t0)
        per = float(np.min(ts)) * 1e9 / (Z * T)
        print(f"{name}: {np.min(ts)*1e3:.1f} ms  ({per:.0f} ns/tile-plane)",
              flush=True)
    except Exception as e:
        print(f"{name}: FAILED {repr(e)[:300]}", flush=True)


def make(body_fn, scratch=(), grid=nG):
    def kern(o_ref, *scr):
        acc = jax.lax.fori_loop(
            0, Z, lambda k, a: jax.lax.fori_loop(
                0, G, lambda g, b: body_fn(k, g, b, scr), a),
            jnp.zeros((8, 128), jnp.float32))
        o_ref[:] = acc

    return pl.pallas_call(
        kern,
        grid=(grid,),
        out_specs=pl.BlockSpec((8, 128), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=list(scratch),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)

    # 1. empty double loop (scalar overhead only)
    timeit("empty_loop", jax.jit(make(lambda k, g, b, s: b + 1.0)))

    # 2. + static vreg read from scratch
    def body2(k, g, b, s):
        return b + s[0][0:8, 0:128]
    timeit("static_read", jax.jit(make(body2, [pltpu.VMEM((pxs, L), jnp.float32)])))

    # 3. + dynamic-offset window read [pxs, pw] (the per-tile slice)
    def body3(k, g, b, s):
        off = (g * 128) % (L - pw)
        off = pl.multiple_of((off // 128) * 128, 128)
        w = s[0][pl.ds((g % 4) * 8, pxs), pl.ds(off, pw)]
        return b + w[0:8, 0:128]
    timeit("dyn_window", jax.jit(make(
        body3, [pltpu.VMEM((Xp, L), jnp.float32)])))

    # 4. matmul on the window (K=pxs), rays-as-lanes out [pw, R]... use
    # [pw, 128] slice of wx to keep vregs bounded; full matmul next
    wxf = jnp.ones((pxs, R), jnp.bfloat16)

    def mk4(wx_spec=False):
        def kern(wx_ref, o_ref, sc):
            def inner(k, g, b):
                w = sc[pl.ds((g % 4) * 8, pxs), pl.ds(0, pw)]
                tmp = jax.lax.dot_general(
                    w.astype(jnp.bfloat16), wx_ref[:],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return b + tmp[0:8, 0:128]
            acc = jax.lax.fori_loop(
                0, Z, lambda k, a: jax.lax.fori_loop(
                    0, G, lambda g, b: inner(k, g, b), a),
                jnp.zeros((8, 128), jnp.float32))
            o_ref[:] = acc
        return pl.pallas_call(
            kern,
            grid=(nG,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda t: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((Xp, L), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )
    timeit("dyn_window_matmul", jax.jit(mk4()), wxf)

    # 5. DMA ring only: one stripe DMA per plane (grid=nG, so nG*Z DMAs)
    packed = jnp.ones((Z, Xp, L), jnp.bfloat16)

    def kern5(p_ref, o_ref, sc, sem):
        def start(slot, k):
            pltpu.make_async_copy(p_ref.at[k, pl.ds(0, pxs)],
                                  sc.at[slot], sem.at[slot]).start()
        def wait(slot):
            pltpu.make_async_copy(sc.at[slot], sc.at[slot], sem.at[slot]).wait()
        start(0, 0)
        start(1, 1)

        def pbody(k, a):
            slot = k % 3
            wait(slot)
            @pl.when(k + 2 < Z)
            def _():
                start((k + 2) % 3, k + 2)
            return a + sc[slot][0:8, 0:128].astype(jnp.float32)
        acc = jax.lax.fori_loop(0, Z, pbody, jnp.zeros((8, 128), jnp.float32))
        o_ref[:] = acc

    fn5 = pl.pallas_call(
        kern5,
        grid=(nG,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((8, 128), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((3, pxs, L), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA((3,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    def run5(p):
        return fn5(p)
    t0 = time.perf_counter()
    jax.block_until_ready(jax.jit(run5)(packed))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(jax.jit(run5)(packed))
        ts.append(time.perf_counter() - t0)
    n_dma = nG * Z
    print(f"dma_ring: {np.min(ts)*1e3:.1f} ms ({np.min(ts)*1e9/n_dma:.0f} "
          f"ns/DMA of {pxs*L*2//1024} KB x {n_dma})", flush=True)


if __name__ == "__main__":
    main()

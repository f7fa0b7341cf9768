#!/usr/bin/env python3
"""Probe Mosaic support for the constructs the transposed sweep kernel needs:
1. dot_general contracting dim 0 of BOTH operands (x^T y pattern).
2. rank-2 -> rank-3 sublane-split reshape + broadcast multiply.
3. static strided sublane extraction tmp3[:, c, :].
4. jnp.repeat on the sublane axis (wsel fallback).
Run on the real TPU: python tools/perf/probe_mosaic.py
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, kernel, out_shape, *args):
    try:
        fn = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(*out_shape),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        got = np.asarray(jax.jit(fn)(*args))
        return got
    except Exception as e:
        print(f"{name}: FAILED {repr(e)[:300]}")
        return None


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)
    pxs, L, R = 48, 768, 1024
    patch = jnp.asarray(rng.normal(size=(pxs, L)).astype(np.float32))
    wx = jnp.asarray(rng.normal(size=(pxs, R)).astype(np.float32))

    # 1. dot_general ((0,),(0,)) -> [L, R]
    def k1(p_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            p_ref[:], w_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    got = run("dot_tt", k1, ((L, R), jnp.float32), patch, wx)
    if got is not None:
        want = np.einsum("pl,pr->lr", np.asarray(patch), np.asarray(wx))
        print("dot_tt: ok, maxerr", float(np.abs(got - want).max()), flush=True)

    # 1b. same with bf16 operands
    def k1b(p_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            p_ref[:].astype(jnp.bfloat16), w_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    got = run("dot_tt_bf16", k1b, ((L, R), jnp.float32), patch, wx)
    if got is not None:
        print("dot_tt_bf16: ok", flush=True)

    # 2. sublane-split reshape + rank-3 broadcast multiply
    Q, Cp = 48, 16
    z = jnp.asarray(rng.normal(size=(Q * Cp, R)).astype(np.float32))
    wy = jnp.asarray(rng.normal(size=(Q, R)).astype(np.float32))

    def k2(z_ref, w_ref, o_ref):
        z3 = z_ref[:].reshape(Q, Cp, R)
        o_ref[:] = (z3 * w_ref[:].reshape(Q, 1, R)).reshape(Q * Cp, R)
    got = run("r3_bcast", k2, ((Q * Cp, R), jnp.float32), z, wy)
    if got is not None:
        want = (np.asarray(z).reshape(Q, Cp, R)
                * np.asarray(wy)[:, None, :]).reshape(Q * Cp, R)
        print("r3_bcast: ok, maxerr", float(np.abs(got - want).max()), flush=True)

    # 3. strided sublane extraction [:, c, :]
    def k3(z_ref, o_ref):
        z3 = z_ref[:].reshape(Q, Cp, R)
        o_ref[:] = z3[:, 11, :]
    got = run("strided_row", k3, ((Q, R), jnp.float32), z)
    if got is not None:
        want = np.asarray(z).reshape(Q, Cp, R)[:, 11, :]
        print("strided_row: ok, maxerr", float(np.abs(got - want).max()), flush=True)

    # 4. jnp.repeat sublane axis
    def k4(w_ref, o_ref):
        o_ref[:] = jnp.repeat(w_ref[:], Cp, axis=0)
    got = run("repeat_sub", k4, ((Q * Cp, R), jnp.float32), wy)
    if got is not None:
        want = np.repeat(np.asarray(wy), Cp, axis=0)
        print("repeat_sub: ok, maxerr", float(np.abs(got - want).max()), flush=True)

    # 5. contiguous sublane-block pairwise reduce (static slices)
    def k5(z_ref, o_ref):
        acc = z_ref[0:384, :] + z_ref[384:768, :]
        acc = acc[0:192, :] + acc[192:384, :]
        acc = acc[0:96, :] + acc[96:192, :]
        acc = acc[0:48, :] + acc[48:96, :]
        acc = acc[0:16, :] + acc[16:32, :] + acc[32:48, :]
        o_ref[:] = acc
    got = run("block_reduce", k5, ((Cp, R), jnp.float32), z)
    if got is not None:
        want = np.asarray(z).reshape(Q, Cp, R).sum(0)
        print("block_reduce: ok, maxerr", float(np.abs(got - want).max()), flush=True)


if __name__ == "__main__":
    main()

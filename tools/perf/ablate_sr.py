#!/usr/bin/env python3
"""Isolate the fused-RDB kernel's cost: time single dense-block applications
at a reduced frame (fast Mosaic compiles) under perf ablations."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from fourk_nerf_tpu.models import sr_esrnet
from fourk_nerf_tpu.ops import pallas_sr

H, W, th, tw = 192, 512, 48, 128
REPS = 20


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)
    blk = sr_esrnet.ResidualDenseBlockSFT(64, 32)
    x = jnp.asarray(rng.normal(size=(1, H, W, 64)).astype(np.float32))
    cond = jnp.asarray(rng.normal(size=(1, H, W, 32)).astype(np.float32))
    params = blk.init(jax.random.PRNGKey(0), x, cond)["params"]
    m = pallas_sr._HALO
    body = x[0].astype(jnp.bfloat16)
    condp = jnp.pad(cond[0].astype(jnp.bfloat16), ((m, m), (m, m), (0, 96)))
    packed = pallas_sr.pack_rdb_weights(params)

    for ab in ("", "aligntaps", "nomask", "nosft", "aligntaps,nomask,nosft",
               "onetap"):
        try:
            f = jax.jit(lambda b, c, ab=ab: pallas_sr.rdb_apply_pallas(
                b, c, packed, H=H, W=W, th=th, tw=tw, ablate=ab))
            out = f(body, condp)
            float(np.asarray(out.reshape(-1)[0]))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(REPS):
                    out = f(body, condp)
                float(np.asarray(out.reshape(-1)[0]))
                ts.append((time.perf_counter() - t0) / REPS)
            print(f"rdb[{ab or 'base'}]: {np.min(ts)*1e3:.2f} ms", flush=True)
        except Exception as e:
            print(f"rdb[{ab}]: FAILED {repr(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()

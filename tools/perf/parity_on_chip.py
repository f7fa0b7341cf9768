#!/usr/bin/env python3
"""On-hardware Pallas parity gate (VERDICT round-2 item 6).

CI runs every Pallas kernel in interpret mode only; Mosaic lowering and
layout bugs are invisible there.  This gate runs the three fused kernels
in f32 on the REAL chip and asserts they match their XLA oracles:

  1. plane-sweep kernel (ops/pallas_sweep) vs the XLA plane sweep,
  2. slab-sweep kernel  (ops/pallas_box)   vs the XLA slab sweep,
  3. SR dense-block kernel (ops/pallas_sr) vs the XLA SFTNet body.

Shapes are chosen small enough to compile+run in ~2 min total but large
enough to exercise multi-tile grids, early termination, window clamping
and frame-edge masking.  Invoked by ``bench.py --check`` so every round's
BENCH capture doubles as a Mosaic-regression gate.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def check_plane_sweep():
    import jax
    import jax.numpy as jnp

    from fourk_nerf_tpu.models import dmpigo
    from fourk_nerf_tpu.ops import pallas_sweep, plane_sweep

    rng = np.random.default_rng(0)
    cfg = dmpigo.make_config(
        xyz_min=[-1.5, -1.67, -1.0], xyz_max=[1.5, 1.67, 1.0],
        num_voxels=128 * 128 * 64, mpi_depth=64,
        fast_color_thres=1.0 / 64 / 5, rgbnet_dim=9, rgbnet_depth=3,
        rgbnet_width=64)
    params, buffers = dmpigo.init(cfg, jax.random.PRNGKey(0))
    params["density"] = jnp.asarray(
        rng.normal(-2.0, 2.0, params["density"].shape).astype(np.float32))
    buffers["mask_cache"] = jnp.asarray(
        rng.uniform(size=cfg.mask_cache_world_size) < 0.5)
    H, W = 96, 128
    focal = 110.0
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
                 np.float32)
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 1.0
    ref = plane_sweep.render_frame(
        cfg, params, buffers, H, W, K, c2w[:3, :4], stepsize=1.0, bg=0.5,
        tile=16, patch=48, use_bf16=False)
    got = pallas_sweep.render_frame_pallas(
        cfg, params, buffers, H, W, K, c2w[:3, :4], stepsize=1.0, bg=0.5,
        tile=(16, 32), patch=None, use_bf16=False, early_exit=True)
    err = float(np.abs(np.asarray(got["rgb_marched"])
                       - np.asarray(ref["rgb_marched"])).max())
    assert err < 5e-4, f"plane-sweep kernel parity: {err}"
    # the tile=None production default on a wide frame: same oracle at
    # 64x640 (round 5 reverted tile=None to (32,128); see
    # render_frame_pallas docstring)
    H2, W2 = 64, 640
    ref2 = plane_sweep.render_frame(
        cfg, params, buffers, H2, W2, K, c2w[:3, :4], stepsize=1.0, bg=0.5,
        tile=16, patch=48, use_bf16=False)
    got2 = pallas_sweep.render_frame_pallas(
        cfg, params, buffers, H2, W2, K, c2w[:3, :4], stepsize=1.0, bg=0.5,
        tile=None, patch=None, use_bf16=False, early_exit=True)
    err2 = float(np.abs(np.asarray(got2["rgb_marched"])
                        - np.asarray(ref2["rgb_marched"])).max())
    assert err2 < 5e-4, f"plane-sweep (8,512) tile parity: {err2}"

    # production-scale smoke (ADVICE r4): the round-4 tile=None default
    # compiled fine at 64x640 but VMEM-OOM'd at the 756x1008/384x384x256
    # scale bench.py actually runs -- so the adopted default must
    # compile+run at THAT scale here, or the gate is not guarding the
    # shipped path.  One frame, no oracle (the 64x640 checks above own
    # numerics); bf16 + early_exit exactly as bench.py dispatches it.
    # viewbase_pe=4/spatial_pe=2 deliberately matches the trained-anchor
    # cfg: the wider viewdir embedding is what pushed the (8,512) scratch
    # over the 100 MB scoped-VMEM budget in round 4 (diag_r5.py), so the
    # smoke covers the HEAVIER of the two cfg classes bench.py renders.
    pcfg = dmpigo.make_config(
        xyz_min=[-1.5, -1.67, -1.0], xyz_max=[1.5, 1.67, 1.0],
        num_voxels=384 * 384 * 256, mpi_depth=256,
        fast_color_thres=1.0 / 256 / 5, rgbnet_dim=9, rgbnet_depth=3,
        rgbnet_width=64, viewbase_pe=4, spatial_pe=2)
    pparams, pbuffers = dmpigo.init(pcfg, jax.random.PRNGKey(0))
    pparams["density"] = jnp.asarray(
        rng.normal(-2.0, 2.0, pparams["density"].shape).astype(np.float32))
    pbuffers["mask_cache"] = jnp.asarray(
        rng.uniform(size=pcfg.mask_cache_world_size) < 0.5)
    Hp, Wp = 756, 1008
    fp = 815.0
    Kp = np.array([[fp, 0, Wp / 2], [0, fp, Hp / 2], [0, 0, 1]], np.float32)
    got3 = pallas_sweep.render_frame_pallas(
        pcfg, pparams, pbuffers, Hp, Wp, Kp, c2w[:3, :4], stepsize=1.0,
        bg=1.0, tile=None, patch=None, use_bf16=True, early_exit=True)
    assert np.isfinite(float(np.asarray(got3["rgb_marched"]).sum())), \
        "production-scale tile=None smoke: non-finite output"
    return max(err, err2)


def check_box_sweep():
    import jax
    import jax.numpy as jnp

    from fourk_nerf_tpu.models import dvgo
    from fourk_nerf_tpu.ops import box_sweep, pallas_box

    rng = np.random.default_rng(1)
    cfg = dvgo.make_config(
        xyz_min=[-1.2, -1.2, -1.2], xyz_max=[1.2, 1.2, 1.2],
        num_voxels=96 ** 3, num_voxels_base=96 ** 3, alpha_init=1e-6,
        rgbnet_dim=12, rgbnet_width=64, rgbnet_depth=3,
        fast_color_thres=1e-4)
    params, buffers = dvgo.init(cfg, jax.random.PRNGKey(0))
    X, Y, Z = cfg.world_size
    gx, gy, gz = np.meshgrid(np.linspace(-1, 1, X), np.linspace(-1, 1, Y),
                             np.linspace(-1, 1, Z), indexing="ij")
    blob = gx ** 2 + gy ** 2 + gz ** 2 < 0.35
    dens = np.where(blob, rng.normal(10.0, 4.0, blob.shape), -6.0)
    params["density"] = jnp.asarray(dens[..., None].astype(np.float32))
    params["k0"] = jnp.asarray(
        rng.normal(0, 1, params["k0"].shape).astype(np.float32))
    buffers["mask_cache"] = jnp.asarray(blob)
    H = W = 160
    f = 0.9 * W
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    ang = 0.4
    Rx = np.array([[1, 0, 0], [0, np.cos(0.5), -np.sin(0.5)],
                   [0, np.sin(0.5), np.cos(0.5)]])
    Ry = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                   [-np.sin(ang), 0, np.cos(ang)]])
    R = (Ry @ Rx).astype(np.float32)
    c2w = np.eye(4, dtype=np.float32)[:3, :4]
    c2w[:3, :3] = R
    c2w[:3, 3] = R @ np.array([0, 0, 4.0], np.float32)
    kw = dict(stepsize=0.5, near=0.2, bg=1.0, use_bf16=False, tile=16)
    ref = box_sweep.render_frame_box(cfg, params, buffers, H, W, K, c2w, **kw)
    got = pallas_box.render_frame_box_pallas(cfg, params, buffers, H, W, K,
                                             c2w, **kw)
    err = float(np.abs(np.asarray(got["rgb_marched"])
                       - np.asarray(ref["rgb_marched"])).max())
    assert err < 5e-4, f"box kernel parity: {err}"
    return err


def check_sr_body():
    import jax
    import jax.numpy as jnp

    from fourk_nerf_tpu.models import sr_esrnet
    from fourk_nerf_tpu.ops import pallas_sr

    rng = np.random.default_rng(2)
    sr_model = sr_esrnet.SFTNet(n_in_colors=3, scale=4, num_feat=64,
                                num_block=5, num_grow_ch=32, num_cond=1)
    sr_params = sr_model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3)),
        jnp.zeros((1, 16, 16, 1)))["params"]
    H, W = 120, 156  # non-multiples: exercises frame-edge masking
    x = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32))
    c = jnp.asarray(rng.uniform(0, 1, (1, H, W, 1)).astype(np.float32))
    # the fused decode is bf16 by construction (production mode); oracle is
    # the XLA bf16 decode -- layout/Mosaic corruption is gross (O(1)),
    # bf16 associativity noise is O(1e-2).  Both calls MUST be jitted: on a
    # tunneled remote backend an eager SFTNet apply is hundreds of per-op
    # round trips (observed: >25 min wall for this one call un-jitted).
    ref = jax.jit(lambda p, x_, c_: sr_esrnet.apply_bf16(
        sr_model, p, x_, c_))(sr_params, x, c)
    got = jax.jit(lambda p, x_, c_: pallas_sr.sftnet_apply_pallas(
        p, x_, c_, scale=4, num_block=5, th=48, tw=128))(sr_params, x, c)
    d = np.abs(np.asarray(got) - np.asarray(ref))
    err = float(np.percentile(d, 99.9))
    assert err < 0.08, f"SR dense-block kernel parity (p99.9): {err}"
    # whole-RRDB fused variant (round 3): same oracle, same bound.  OPT-IN
    # only (FOURK_SR_FUSE_RRDB=1): it is not a production path — its fern-
    # scale Mosaic compile never finished in a 38-min bound (3 attempts,
    # profile_r4/sr_decode_variants.md) and the kernel BODY dominates
    # compile cost, so even this small-grid check can stall the gate.
    err_f = 0.0
    if os.environ.get("FOURK_SR_FUSE_RRDB") == "1":
        got_f = jax.jit(lambda p, x_, c_: pallas_sr.sftnet_apply_pallas(
            p, x_, c_, scale=4, num_block=5, th=48, tw=128,
            fuse_rrdb=True))(sr_params, x, c)
        d_f = np.abs(np.asarray(got_f) - np.asarray(ref))
        err_f = float(np.percentile(d_f, 99.9))
        assert err_f < 0.08, f"fused-RRDB kernel parity (p99.9): {err_f}"
    # dilated upchain (round 4, the adopted production default): exact
    # weight-space rewrite of nearest-up+conv (ops/s2d.py), so same bound
    got_d = jax.jit(lambda p, x_, c_: pallas_sr.sftnet_apply_pallas(
        p, x_, c_, scale=4, num_block=5, th=48, tw=128,
        upchain="dilated"))(sr_params, x, c)
    d_d = np.abs(np.asarray(got_d) - np.asarray(ref))
    err_d = float(np.percentile(d_d, 99.9))
    assert err_d < 0.08, f"dilated-upchain decode parity (p99.9): {err_d}"
    return max(err, err_f, err_d)


def main():
    results = {}
    for name, fn in (("plane_sweep", check_plane_sweep),
                     ("box_sweep", check_box_sweep),
                     ("sr_body", check_sr_body)):
        t0 = time.time()
        err = fn()
        results[name] = err
        print(f"# parity {name}: max|err| {err:.2e} ({time.time()-t0:.0f}s)",
              flush=True)
    print(f"# parity gate PASSED: {results}")
    return results


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Time the PRODUCTION encoder pretrain step for the BOUNDED family at lego
scale (BASELINE.json milestone config #1: 'lego pretrain').

The bounded forward samples rays with fixed-K masked sampling and reads the
grids through trilinear GATHERS (models/dvgo.py:forward); unlike the NDC
family there is no sweep-based train path yet.  This bench pins the actual
cost: reference syn fine config (160^3 grid, 12-ch k0, 128-wide MLP,
stepsize 0.5, N_rand 8192 random rays), steady-state step (TV off after the
early phase), per-voxel lr on density like run.py.

Run: bash tools/perf/tpu_run.sh tools/perf/bench_dvgo_step.py /tmp/dvgo_step.log
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from fourk_nerf_tpu.config import ConfigDict
from fourk_nerf_tpu.models import dvgo
from fourk_nerf_tpu.ops import rays as ray_ops
from fourk_nerf_tpu.train import optim, trainer


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    # lego fine model (reference configs/default.py:109-111 + syn bounds)
    cfg = dvgo.make_config(
        xyz_min=[-1.3, -1.3, -1.3], xyz_max=[1.3, 1.3, 1.3],
        num_voxels=160 ** 3, num_voxels_base=160 ** 3, alpha_init=1e-6,
        rgbnet_dim=12, rgbnet_depth=3, rgbnet_width=128,
        fast_color_thres=1e-4)
    key = jax.random.PRNGKey(0)
    params, buffers = dvgo.init(cfg, key)
    rng = np.random.default_rng(0)
    X, Y, Z = cfg.world_size
    gx, gy, gz = np.meshgrid(np.linspace(-1, 1, X), np.linspace(-1, 1, Y),
                             np.linspace(-1, 1, Z), indexing="ij")
    blob = gx ** 2 + gy ** 2 + gz ** 2 < 0.5
    params["density"] = jnp.asarray(np.where(
        blob, rng.normal(2.0, 2.0, blob.shape), -4.0)[..., None].astype(np.float32))
    buffers["mask_cache"] = jnp.asarray(blob)

    cfg_train = ConfigDict(dict(
        weight_main=1.0, weight_entropy_last=0.001, weight_distortion=0.0,
        weight_rgbper=0.01, weight_nearclip=0.0, weight_tv_density=0.0,
        weight_tv_k0=0.0, N_rand=8192, lrate_decay=20,
        skip_zero_grad_fields=["density", "k0"],
    ))
    render_kwargs = dict(near=2.0, far=6.0, bg=1.0, stepsize=0.5,
                         rand_bkgd=True, ndc_planes=False)
    train_step = trainer.make_train_step(
        dvgo, cfg, cfg_train, render_kwargs=render_kwargs,
        skip_zero_grad=frozenset(cfg_train.skip_zero_grad_fields))

    # random rays of a real lego-style camera ring (N_rand dirs from one view)
    H, W, f = 800, 800, 1111.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    c2w = np.eye(4, dtype=np.float32)[:3, :4]
    c2w[:3, 3] = [0, 0, 4.0]
    ro, rd, vd = ray_ops.get_rays_of_a_view(
        H, W, K, c2w, ndc=False, inverse_y=False, flip_x=False, flip_y=False)
    sel = rng.choice(H * W, cfg_train.N_rand, replace=False)
    flat = lambda x: jnp.asarray(np.asarray(x).reshape(-1, 3)[sel])
    target = jnp.asarray(
        rng.uniform(0, 1, (cfg_train.N_rand, 3)).astype(np.float32))
    batch = (flat(ro), flat(rd), flat(vd), target)

    opt_state = optim.init_state({k: params[k] for k in params})
    lrs = {"density": 0.1, "k0": 0.1, "rgbnet": 1e-3}
    per_lr = None

    def step(p, o, i):
        return train_step(p, buffers, o, batch, lrs, per_lr,
                          jax.random.PRNGKey(i), apply_tv=False,
                          tv_dense=False)

    t0 = time.perf_counter()
    out = step(params, opt_state, 0)
    jax.block_until_ready(out[0]["density"])
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s", flush=True)

    ts = []
    p_, o_ = out[0], out[1]
    for i in range(10):
        t0 = time.perf_counter()
        out = step(p_, o_, i + 1)
        p_, o_ = out[0], out[1]
        float(np.asarray(p_["density"].reshape(-1)[0]))
        ts.append(time.perf_counter() - t0)
    step_ms = float(np.median(ts)) * 1e3
    print(f"dvgo GATHER step (lego 160^3, N_rand 8192 random rays): "
          f"{step_ms:.1f} ms -> {1e3 / step_ms:.1f} it/s; 20k iters = "
          f"{step_ms * 20e3 / 60e3:.1f} min", flush=True)

    # --- patch_box slab-sweep train step on the same scene ---------------
    # (coherent 88x88 patch = 7744 rays vs 8192 random; the TPU-native
    # bounded train path, gradient parity in tests/test_box_train.py)
    from fourk_nerf_tpu.ops import box_sweep

    P = 88
    r0, c0 = (H - P) // 2, (W - P) // 2
    slp = (slice(r0, r0 + P), slice(c0, c0 + P))
    ro_p = np.asarray(ro)[slp].reshape(-1, 3)
    rd_p = np.asarray(rd)[slp].reshape(-1, 3)
    vd_p = np.asarray(vd)[slp].reshape(-1, 3)
    plan = box_sweep.box_train_plan(cfg, ro_p, rd_p,
                                    stepsize=render_kwargs["stepsize"],
                                    near=render_kwargs["near"])
    if plan is None:
        print("patch_box: no dominant axis for this camera", flush=True)
        return
    axis, flip, S = plan
    pupv = box_sweep.box_window_size_for(
        cfg, ro_p, rd_p, vd_p, stepsize=render_kwargs["stepsize"],
        near=render_kwargs["near"], axis=axis, flip=flip, cap=96)
    print(f"patch_box plan: axis={axis} flip={flip} S={S} window={pupv}",
          flush=True)
    if pupv is None:
        return
    box_step = trainer.make_box_train_steps(
        dvgo, cfg, cfg_train, render_kwargs=render_kwargs,
        skip_zero_grad=frozenset(cfg_train.skip_zero_grad_fields),
        Pu=pupv[0], Pv=pupv[1])(axis, flip, S)
    batch_p = tuple(jnp.asarray(x) for x in (ro_p, rd_p, vd_p)) + (
        jnp.asarray(rng.uniform(0, 1, (P * P, 3)).astype(np.float32)),)

    def bstep(p, o, i):
        return box_step(p, buffers, o, batch_p, lrs, per_lr,
                        jax.random.PRNGKey(i), apply_tv=False, tv_dense=False)

    opt2 = optim.init_state({k: p_[k] for k in p_})
    t0 = time.perf_counter()
    out = bstep(p_, opt2, 0)
    jax.block_until_ready(out[0]["density"])
    print(f"[patch_box] compile+first step: {time.perf_counter() - t0:.1f}s",
          flush=True)
    ts = []
    p2, o2 = out[0], out[1]
    for i in range(10):
        t0 = time.perf_counter()
        out = bstep(p2, o2, i + 1)
        p2, o2 = out[0], out[1]
        float(np.asarray(p2["density"].reshape(-1)[0]))
        ts.append(time.perf_counter() - t0)
    bms = float(np.median(ts)) * 1e3
    print(f"dvgo PATCH_BOX step (lego 160^3, {P}x{P} patch): {bms:.1f} ms "
          f"-> {1e3 / bms:.1f} it/s; 20k iters = {bms * 20e3 / 60e3:.1f} min; "
          f"speedup {step_ms / bms:.2f}x", flush=True)


if __name__ == "__main__":
    main()

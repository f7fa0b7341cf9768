#!/usr/bin/env python3
"""Time the PRODUCTION joint G+D training step at fern scale on the TPU --
the baseline for ROADMAP round-3 lever #3 (300k-iter joint runs amortize
any win here 300,000x).

Run: bash tools/perf/tpu_run.sh tools/perf/bench_train_step.py /tmp/ts.log
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

from fourk_nerf_tpu.config import ConfigDict
from fourk_nerf_tpu.models import dmpigo, sr_esrnet, sr_unetdisc
from fourk_nerf_tpu.ops import rays as ray_ops
from fourk_nerf_tpu.train import optim, sr_trainer


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    patch, sr_ratio = 64, 4
    # fern fine model (configs/llff/llff_default_lg.py scale)
    model_cfg = dmpigo.make_config(
        xyz_min=[-1.5, -1.67, -1.0], xyz_max=[1.5, 1.67, 1.0],
        num_voxels=384 * 384 * 256, mpi_depth=256,
        fast_color_thres=1.0 / 256 / 5, rgbnet_dim=9, rgbnet_depth=3,
        rgbnet_width=64,
    )
    assert dmpigo.plane_aligned_ok(model_cfg, 1.0, ndc=True)
    key = jax.random.PRNGKey(0)
    params, buffers = dmpigo.init(model_cfg, key)
    rng = np.random.default_rng(0)
    params["density"] = jnp.asarray(
        rng.normal(-2, 2, params["density"].shape).astype(np.float32))

    cfg_model = ConfigDict(dict(num_cond=1, dim_rend=3, d_model="Unet"))
    cfg_train = ConfigDict(dict(
        weight_main=1.0, weight_entropy_last=1e-3, weight_distortion=0.01,
        weight_rgbper=0.01, weight_gan=0.05, weight_tv_density=1e-6,
        weight_tv_k0=1e-7, N_patch=patch, lrate_decay=300,
        skip_zero_grad_fields=["density", "k0"],
    ))
    # FOURK_TS_PCP=1 reproduces the round-5 fern-slice configuration: the
    # full published objective incl. the random-VGG perceptual/style tower
    # (the slice's full-grid joint-step compile 500'd at the iter-8000
    # boundary; bench_train_step had only ever compiled the tower-less step)
    import os
    perceptual = None
    if os.environ.get("FOURK_TS_PCP", "0") == "1":
        from fourk_nerf_tpu.train import sr_losses
        cfg_train.weight_pcp = 0.5
        cfg_train.weight_style = 0.2
        perceptual = sr_losses.PerceptualLoss(
            perceptual_weight=0.5, style_weight=0.2, allow_random_vgg=True)
    only = os.environ.get("FOURK_TS_ONLY", "")
    render_kwargs = dict(near=0.0, far=1.0, bg=1.0, stepsize=1.0,
                         rand_bkgd=True, ndc_planes=True)
    sr_model = sr_esrnet.SFTNet(n_in_colors=3, scale=sr_ratio, num_feat=64,
                                num_block=5, num_grow_ch=32, num_cond=1)
    key, k_sr, k_d = jax.random.split(key, 3)
    sr_params = sr_model.init(
        k_sr, jnp.zeros((1, patch, patch, 3)),
        jnp.zeros((1, patch, patch, 1)))["params"]
    d_model = sr_unetdisc.UNetDiscriminatorSN(num_feat=64)
    d_vars = d_model.init(
        k_d, jnp.zeros((1, patch * sr_ratio, patch * sr_ratio, 3)))
    d_params, d_state = d_vars["params"], d_vars["spectral"]

    # a central 64px patch of a fern-scale camera (1008x756, f=815): the
    # training sampler's real geometry, not a whole tiny frame
    Hf, Wf, f = 756, 1008, 815.0
    K = np.array([[f, 0, Wf / 2], [0, f, Hf / 2], [0, 0, 1]], np.float32)
    c2w = np.eye(4, dtype=np.float32)[:3, :4]
    c2w[2, 3] = 1.0
    from fourk_nerf_tpu.ops import plane_sweep
    ro_f, rd_f, vd_f = ray_ops.get_rays_of_a_view(
        Hf, Wf, K, c2w, ndc=True, inverse_y=False, flip_x=False, flip_y=False)
    r0, c0 = (Hf - patch) // 2, (Wf - patch) // 2
    sl = (slice(r0, r0 + patch), slice(c0, c0 + patch))
    ro = np.asarray(ro_f)[sl]
    rd = np.asarray(rd_f)[sl]
    vd = np.asarray(vd_f)[sl]
    a, b = plane_sweep._affine_coeffs(
        jnp.asarray(ro), jnp.asarray(rd),
        jnp.asarray(model_cfg.xyz_min), jnp.asarray(model_cfg.xyz_max),
        jnp.asarray([model_cfg.world_size[0], model_cfg.world_size[1]],
                    jnp.float32), model_cfg.world_size[2])
    a_all = np.asarray(a).reshape(1, patch, patch, 2)
    b_all = np.asarray(b).reshape(1, patch, patch, 2)
    sp = sr_trainer.sweep_patch_size_for(
        model_cfg, a_all, b_all, np.array([0]), np.array([0]), patch)
    gw = sr_trainer.sweep_window_size_for(
        model_cfg, a_all, b_all, np.array([0]), np.array([0]), patch, sp)
    print(f"sweep_patch: {sp}, grid_window: {gw}", flush=True)

    def build_step(grid_window):
        return sr_trainer.make_sr_train_step(
            dmpigo, model_cfg, cfg_train, cfg_model, render_kwargs=render_kwargs,
            skip_zero_grad=frozenset(cfg_train.skip_zero_grad_fields),
            sr_model=sr_model, d_model=d_model, n_views=1, patch=patch,
            sr_ratio=sr_ratio, perceptual=perceptual, d_kind="Unet",
            sweep_patch=sp,
            grid_window=grid_window,
        )
    flat = lambda x: jnp.asarray(np.asarray(x).reshape(-1, 3))
    target = jnp.asarray(rng.uniform(0, 1, (patch * patch, 3)).astype(np.float32))
    target_hr = jnp.asarray(rng.uniform(
        0, 1, (patch * sr_ratio * patch * sr_ratio, 3)).astype(np.float32))
    batch = (flat(ro), flat(rd), flat(vd), target, target_hr, jnp.eye(3))

    enc_opt = optim.init_state({k: params[k] for k in params})
    sr_opt = optim.init_state({"srnet": sr_params})
    d_opt = optim.init_state({"d": d_params})
    lrs = {"enc": {"density": 0.1, "k0": 0.1, "rgbnet": 1e-3},
           "srnet": 2e-4, "d": 2e-4}
    # steady-state step: the reference disables TV after 10k of 300k iters
    # (tv_before/tv_dense_before); the dense-k0 TV gradient also OOMs the
    # fern grid on a 16G chip alongside Adam moments
    results = {}
    out = (params, enc_opt, sr_params, sr_opt, d_params, d_state, d_opt)
    variants = (("full-grid", None), ("windowed", gw))
    if only:
        variants = tuple(v for v in variants if v[0] == only)
    for label, grid_window in variants:
        train_step = build_step(grid_window)

        vgg_dev = perceptual.params if perceptual is not None else None

        def step(ep, eo, sp_, so, dp, ds, do_, i):
            return train_step(ep, buffers, eo, sp_, so, dp, ds, do_, batch,
                              lrs, jax.random.PRNGKey(i), vgg_dev,
                              apply_tv=False, tv_dense=False)

        t0 = time.perf_counter()
        o = step(*out, 0)
        jax.block_until_ready(o[0]["density"])
        print(f"[{label}] compile+first step: {time.perf_counter() - t0:.1f}s",
              flush=True)
        out = o[:7]
        ts = []
        for i in range(10):
            t0 = time.perf_counter()
            o = step(*out, i + 1)
            out = o[:7]
            float(np.asarray(out[0]["density"].reshape(-1)[0]))
            ts.append(time.perf_counter() - t0)
        step_ms = float(np.median(ts)) * 1e3
        results[label] = step_ms
        print(f"[{label}] joint G+D step (fern grid, {patch}px patch): "
              f"{step_ms:.1f} ms -> {1e3 / step_ms:.1f} it/s; 300k iters = "
              f"{step_ms * 300e3 / 3.6e6:.1f} h", flush=True)

        if perceptual is not None:
            continue  # repro mode: don't overwrite the round-4 traces
        import pathlib
        tdir = pathlib.Path(f"/root/repo/profile_r4/train_step_{label}")
        tdir.mkdir(parents=True, exist_ok=True)
        try:
            with jax.profiler.trace(str(tdir)):
                o = step(*out, 99)
                out = o[:7]
                jax.block_until_ready(out[0]["density"])
            print(f"[{label}] trace ok", flush=True)
        except Exception as e:
            print(f"[{label}] trace failed: {e}", flush=True)
    if len(results) == 2:
        print(f"speedup: {results['full-grid'] / results['windowed']:.2f}x",
              flush=True)


if __name__ == "__main__":
    main()

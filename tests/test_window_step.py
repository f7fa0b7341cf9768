"""Footprint-window joint G-step == full-grid joint G-step, exactly.

The windowed step (train/sr_trainer.py: ``grid_window``) slices the patch's
static-size grid window outside the grad, renders/differentiates only the
window, and lets MaskedAdam update only the window.  Under skip_zero_grad
semantics this must be EXACTLY the full-grid step: outside the window the
gradient is identically zero, so the masked update leaves params and both
moments untouched.  These tests verify that end-to-end on a tiny
plane-aligned scene, plus the windowed MaskedAdam against its full oracle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourk_nerf_tpu.config import ConfigDict
from fourk_nerf_tpu.models import dmpigo, sr_esrnet, sr_unetdisc
from fourk_nerf_tpu.ops import rays as ray_ops
from fourk_nerf_tpu.train import optim, sr_trainer


def _setup(grid_window):
    """Joint G+D step on a 64x64x8 grid with an OFF-CENTER 8px patch, so the
    window is a proper sub-grid."""
    patch, sr_ratio = 8, 4
    model_cfg = dmpigo.make_config(
        xyz_min=[-2.0, -2.0, -1.0], xyz_max=[2.0, 2.0, 1.0],
        num_voxels=64 * 64 * 8, mpi_depth=8,
        fast_color_thres=1e-4, rgbnet_dim=6, rgbnet_width=16,
    )
    assert dmpigo.plane_aligned_ok(model_cfg, 1.0, ndc=True)
    key = jax.random.PRNGKey(0)
    params, buffers = dmpigo.init(model_cfg, key)
    rng = np.random.default_rng(0)
    params["density"] = jnp.asarray(
        rng.normal(0, 1, params["density"].shape).astype(np.float32))
    params["k0"] = jnp.asarray(
        rng.normal(0, 1, params["k0"].shape).astype(np.float32))
    # non-trivial mask so the masked-alpha gate is exercised (channel mode:
    # mask res == grid res)
    buffers = dict(buffers)
    buffers["mask_cache"] = jnp.asarray(
        rng.uniform(size=model_cfg.world_size) < 0.7)

    cfg_model = ConfigDict(dict(num_cond=1, dim_rend=3, d_model="Unet"))
    cfg_train = ConfigDict(dict(
        weight_main=1.0, weight_entropy_last=1e-3, weight_distortion=0.01,
        weight_rgbper=0.01, weight_gan=0.05, weight_tv_density=1e-4,
        weight_tv_k0=1e-5, N_patch=patch, lrate_decay=20,
        skip_zero_grad_fields=["density", "k0"],
    ))
    render_kwargs = dict(near=0.0, far=1.0, bg=1.0, stepsize=1.0,
                         rand_bkgd=True, ndc_planes=True)
    sr_model = sr_esrnet.SFTNet(n_in_colors=3, scale=sr_ratio, num_feat=16,
                                num_block=1, num_grow_ch=8, num_cond=1)
    key, k_sr, k_d = jax.random.split(key, 3)
    sr_params = sr_model.init(
        k_sr, jnp.zeros((1, patch, patch, 3)),
        jnp.zeros((1, patch, patch, 1)))["params"]
    d_model = sr_unetdisc.UNetDiscriminatorSN(num_feat=16)
    d_vars = d_model.init(
        k_d, jnp.zeros((1, patch * sr_ratio, patch * sr_ratio, 3)))
    d_params, d_state = d_vars["params"], d_vars["spectral"]

    train_step = sr_trainer.make_sr_train_step(
        dmpigo, model_cfg, cfg_train, cfg_model, render_kwargs=render_kwargs,
        skip_zero_grad=frozenset(cfg_train.skip_zero_grad_fields),
        sr_model=sr_model, d_model=d_model, n_views=1, patch=patch,
        sr_ratio=sr_ratio, perceptual=None, d_kind="Unet", sweep_patch=24,
        grid_window=grid_window, donate=False,
    )

    # off-center patch of a larger frame
    H = W = 32
    f = 20.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    c2w = np.eye(4, dtype=np.float32)[:3, :4]
    c2w[2, 3] = 1.0
    ro, rd, vd = ray_ops.get_rays_of_a_view(
        H, W, K, c2w, ndc=True, inverse_y=False, flip_x=False, flip_y=False)
    r0, c0 = 19, 5
    sl = (slice(r0, r0 + patch), slice(c0, c0 + patch))
    flat = lambda x: jnp.asarray(np.asarray(x)[sl].reshape(-1, 3))
    target = jnp.asarray(
        rng.uniform(0, 1, (patch * patch, 3)).astype(np.float32))
    target_hr = jnp.asarray(rng.uniform(
        0, 1, (patch * sr_ratio * patch * sr_ratio, 3)).astype(np.float32))
    batch = (flat(ro), flat(rd), flat(vd), target, target_hr, jnp.eye(3))

    enc_opt = optim.init_state({k: params[k] for k in params})
    sr_opt = optim.init_state({"srnet": sr_params})
    d_opt = optim.init_state({"d": d_params})
    lrs = {"enc": {"density": 0.1, "k0": 0.1, "rgbnet": 1e-3},
           "srnet": 2e-4, "d": 2e-4}
    state = (params, buffers, enc_opt, sr_params, sr_opt, d_params, d_state,
             d_opt)
    return train_step, state, batch, lrs


def _run(train_step, state, batch, lrs, n=2):
    params, buffers, enc_opt, sr_params, sr_opt, d_params, d_state, d_opt = state
    for i in range(n):
        out = train_step(params, buffers, enc_opt, sr_params, sr_opt,
                         d_params, d_state, d_opt, batch, lrs,
                         jax.random.PRNGKey(7 + i), apply_tv=False,
                         tv_dense=False)
        (params, enc_opt, sr_params, sr_opt, d_params, d_state, d_opt,
         loss, psnr, terms) = out
    return params, enc_opt, sr_params, d_params, loss, psnr


@pytest.mark.slow
def test_windowed_step_equals_full_step():
    full = _run(*_setup(grid_window=None))
    win = _run(*_setup(grid_window=32))
    for name, a, b in (("density", full[0]["density"], win[0]["density"]),
                       ("k0", full[0]["k0"], win[0]["k0"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7,
                                   err_msg=name)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-7), full[0]["rgbnet"],
        win[0]["rgbnet"])
    # optimizer moments must match too (the windowed Adam writes only the
    # window; the full masked Adam leaves zero-grad entries untouched)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-7),
        full[1]["exp_avg"], win[1]["exp_avg"])
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-7),
        full[2], win[2])  # sr params (grads flow through the window render)
    np.testing.assert_allclose(float(full[4]), float(win[4]), atol=1e-6)


@pytest.mark.smoke
def test_windowed_masked_adam_equals_full():
    rng = np.random.default_rng(3)
    X, Y, Z, C = 20, 18, 6, 4
    gw = 8
    ox, oy = 5, 7
    p = rng.normal(size=(X, Y, Z, C)).astype(np.float32)
    m = rng.normal(size=(X, Y, Z, C)).astype(np.float32) * 0.1
    v = abs(rng.normal(size=(X, Y, Z, C)).astype(np.float32)) * 0.01
    g_win = rng.normal(size=(gw, gw, Z, C)).astype(np.float32)
    g_win[1, 2, 3] = 0.0  # in-window zero grads must also be skipped
    g_full = np.zeros_like(p)
    g_full[ox:ox + gw, oy:oy + gw] = g_win

    state = {"exp_avg": {"density": jnp.asarray(m)},
             "exp_avg_sq": {"density": jnp.asarray(v)},
             "step": jnp.asarray(4, jnp.int32)}
    lrs = {"density": 0.05}
    skip = frozenset(["density"])
    full_p, full_s = optim.apply_updates(
        {"density": jnp.asarray(p)}, {"density": jnp.asarray(g_full)},
        jax.tree.map(jnp.asarray, state), lrs, skip_zero_grad=skip)
    win_p, win_s = optim.apply_updates(
        {"density": jnp.asarray(p)}, {"density": jnp.asarray(g_win)},
        jax.tree.map(jnp.asarray, state), lrs, skip_zero_grad=skip,
        windows={"density": (jnp.asarray(ox), jnp.asarray(oy))})
    np.testing.assert_array_equal(np.asarray(full_p["density"]),
                                  np.asarray(win_p["density"]))
    np.testing.assert_array_equal(np.asarray(full_s["exp_avg"]["density"]),
                                  np.asarray(win_s["exp_avg"]["density"]))
    np.testing.assert_array_equal(np.asarray(full_s["exp_avg_sq"]["density"]),
                                  np.asarray(win_s["exp_avg_sq"]["density"]))
    assert int(win_s["step"]) == 5


@pytest.mark.smoke
def test_window_size_covers_union_footprint():
    cfg = dmpigo.make_config(
        xyz_min=[-2.0, -2.0, -1.0], xyz_max=[2.0, 2.0, 1.0],
        num_voxels=64 * 64 * 8, mpi_depth=8, rgbnet_dim=6)
    H = W = 32
    f = 20.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    c2w = np.eye(4, dtype=np.float32)[:3, :4]
    c2w[2, 3] = 1.0
    ro, rd, _ = ray_ops.get_rays_of_a_view(
        H, W, K, c2w, ndc=True, inverse_y=False, flip_x=False, flip_y=False)
    X, Y, Z = cfg.world_size
    sizes = np.array([X, Y], np.float32)
    mn = np.asarray(cfg.xyz_min, np.float32)
    mx = np.asarray(cfg.xyz_max, np.float32)
    a = (np.asarray(ro)[None, ..., :2] - mn[:2]) / (mx[:2] - mn[:2]) * (sizes - 1)
    b = np.asarray(rd)[None, ..., :2] / (mx[:2] - mn[:2]) * (sizes - 1) / (Z - 1)
    patch = 8
    rows = sorted({min(r, H - patch) for r in range(0, H, patch)})
    cols = sorted({min(c, W - patch) for c in range(0, W, patch)})
    sp = sr_trainer.sweep_patch_size_for(cfg, a, b, rows, cols, patch)
    gw = sr_trainer.sweep_window_size_for(cfg, a, b, rows, cols, patch, sp)
    assert gw is not None and gw >= sp
    # the union footprint of every sampler patch fits the window with the
    # -1 origin margin
    for r in rows:
        for c in cols:
            blk0 = a[:, r:r + patch, c:c + patch].reshape(-1, 2)
            blk1 = (a + b * (Z - 1))[:, r:r + patch, c:c + patch].reshape(-1, 2)
            mn2 = np.minimum(blk0.min(0), blk1.min(0))
            mx2 = np.maximum(blk0.max(0), blk1.max(0))
            assert (np.floor(mx2) + 1 - (np.floor(mn2) - 1) + 1 <= gw).all()

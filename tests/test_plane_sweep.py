"""Gather-free plane-sweep renderer vs the reference-exact dmpigo forward."""

import numpy as np
import jax
import jax.numpy as jnp

from fourk_nerf_tpu.models import dmpigo
from fourk_nerf_tpu.ops import plane_sweep, rays as ray_ops


def _scene(D=16, seed=0):
    cfg = dmpigo.make_config(
        xyz_min=[-1.3, -1.2, -1.0], xyz_max=[1.3, 1.2, 1.0],
        num_voxels=32 * 32 * D, mpi_depth=D,
        fast_color_thres=1.0 / D / 5, rgbnet_dim=6, rgbnet_width=16,
    )
    params, buffers = dmpigo.init(cfg, jax.random.PRNGKey(seed))
    rng = np.random.default_rng(seed)
    params["density"] = jnp.asarray(rng.normal(-1, 2, params["density"].shape).astype(np.float32))
    params["k0"] = jnp.asarray(rng.normal(0, 1, params["k0"].shape).astype(np.float32))
    return cfg, params, buffers


def _cam(H=24, W=32, f=30.0):
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], dtype=np.float32)
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 1.0
    return K, c2w[:3, :4]


def test_plane_sweep_matches_forward():
    cfg, params, buffers = _scene()
    H, W = 24, 32
    K, c2w = _cam(H, W)
    out = plane_sweep.render_frame(
        cfg, params, buffers, H, W, K, c2w, stepsize=1.0, bg=0.5, tile=8, patch=24, use_bf16=False
    )
    # reference path on the same rays
    ro, rd, vd = ray_ops.get_rays_of_a_view(H, W, K, c2w, ndc=True, inverse_y=False,
                                            flip_x=False, flip_y=False)
    ref = dmpigo.forward(
        cfg, params, buffers,
        jnp.asarray(np.asarray(ro).reshape(-1, 3)),
        jnp.asarray(np.asarray(rd).reshape(-1, 3)),
        jnp.asarray(np.asarray(vd).reshape(-1, 3)),
        stepsize=1.0, bg=0.5, render_depth=True, ndc_planes=True,
    )
    rgb_ref = np.asarray(ref["rgb_marched"]).reshape(H, W, 3)
    rgb_ps = np.asarray(out["rgb_marched"])
    assert np.allclose(rgb_ps, rgb_ref, atol=1e-4), np.abs(rgb_ps - rgb_ref).max()
    ail_ref = np.asarray(ref["alphainv_last"]).reshape(H, W)
    assert np.allclose(np.asarray(out["alphainv_last"]), ail_ref, atol=1e-4)
    d_ref = np.asarray(ref["depth"]).reshape(H, W)
    assert np.allclose(np.asarray(out["depth"]), d_ref, atol=1e-4)


def test_plane_sweep_with_occupancy_mask_exact():
    """The sweep's mask channel uses SNAPPED (one-hot) hat weights =
    nearest-neighbor maskcache_lookup semantics; at matching resolutions it
    must match the reference-exact chunked path EXACTLY."""
    cfg, params, buffers = _scene(seed=1)
    rng = np.random.default_rng(2)
    mask = rng.uniform(size=cfg.mask_cache_world_size) < 0.7
    buffers = {**buffers, "mask_cache": jnp.asarray(mask)}
    H, W = 16, 16
    K, c2w = _cam(H, W, f=40.0)
    out = plane_sweep.render_frame(
        cfg, params, buffers, H, W, K, c2w, stepsize=1.0, bg=0.25, tile=4,
        patch=24, use_bf16=False,
    )
    ro, rd, vd = ray_ops.get_rays_of_a_view(H, W, K, c2w, ndc=True, inverse_y=False,
                                            flip_x=False, flip_y=False)
    ref = dmpigo.forward(
        cfg, params, buffers,
        jnp.asarray(np.asarray(ro).reshape(-1, 3)),
        jnp.asarray(np.asarray(rd).reshape(-1, 3)),
        jnp.asarray(np.asarray(vd).reshape(-1, 3)),
        stepsize=1.0, bg=0.25, ndc_planes=True,
    )
    rgb_ref = np.asarray(ref["rgb_marched"]).reshape(H, W, 3)
    err = np.abs(np.asarray(out["rgb_marched"]) - rgb_ref).max(axis=-1)
    # identical semantics; the two paths compute the sample position with
    # different float associativity, so a sample landing within an ulp of a
    # 0.5 nearest-neighbor boundary may flip -- allow a handful of pixels
    assert float((err > 1e-4).mean()) < 0.02, float((err > 1e-4).mean())
    assert float(err.max()) < 0.05, float(err.max())


def test_plane_sweep_mismatched_mask_resolution_quantified():
    """pg_scale leaves the mask at the pre-scale resolution; the sweep
    nearest-resamples it onto the grid. Quantify the deviation vs the
    chunked path's direct nearest lookup: at most a half-voxel boundary
    shift, so only a small fraction of pixels may differ."""
    cfg, params, buffers = _scene(seed=3)
    X, Y, Z = cfg.world_size
    rng = np.random.default_rng(4)
    # half-resolution mask (what pg_scale produces before the cache update)
    small = (max(X // 2, 2), max(Y // 2, 2), max(Z // 2, 2))
    mask = rng.uniform(size=small) < 0.7
    buffers = {**buffers, "mask_cache": jnp.asarray(mask)}
    H, W = 16, 16
    K, c2w = _cam(H, W, f=40.0)
    out = plane_sweep.render_frame(
        cfg, params, buffers, H, W, K, c2w, stepsize=1.0, bg=0.25, tile=4,
        patch=24, use_bf16=False,
    )
    ro, rd, vd = ray_ops.get_rays_of_a_view(H, W, K, c2w, ndc=True, inverse_y=False,
                                            flip_x=False, flip_y=False)
    ref = dmpigo.forward(
        cfg, params, buffers,
        jnp.asarray(np.asarray(ro).reshape(-1, 3)),
        jnp.asarray(np.asarray(rd).reshape(-1, 3)),
        jnp.asarray(np.asarray(vd).reshape(-1, 3)),
        stepsize=1.0, bg=0.25, ndc_planes=True,
    )
    rgb_ref = np.asarray(ref["rgb_marched"]).reshape(H, W, 3)
    rgb_ps = np.asarray(out["rgb_marched"])
    err = np.abs(rgb_ps - rgb_ref).max(axis=-1)
    frac_diff = float((err > 1e-3).mean())
    # the deviation is bounded: most pixels identical, none catastrophically off
    assert frac_diff < 0.15, frac_diff
    mse = float(np.mean((rgb_ps - rgb_ref) ** 2))
    psnr = -10 * np.log10(mse + 1e-12)
    assert psnr > 25.0, psnr


def test_footprint_guard_raises():
    cfg, params, buffers = _scene()
    H, W = 24, 32
    K, c2w = _cam(H, W, f=8.0)  # extreme FOV -> huge footprint
    try:
        plane_sweep.render_frame(
            cfg, params, buffers, H, W, K, c2w, stepsize=1.0, bg=0.0, tile=16, patch=8
        )
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_sweep_patch_train_matches_forward_values_and_grads():
    """Training-path sweep: outputs AND gradients equal dmpigo.forward."""
    from fourk_nerf_tpu.ops import plane_sweep

    # larger xy grid so one 8x8-pixel patch's footprint fits the slice
    cfg = dmpigo.make_config(
        xyz_min=[-1.3, -1.2, -1.0], xyz_max=[1.3, 1.2, 1.0],
        num_voxels=64 * 64 * 16, mpi_depth=16,
        fast_color_thres=1.0 / 16 / 5, rgbnet_dim=6, rgbnet_width=16,
    )
    params, buffers = dmpigo.init(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    params["density"] = jnp.asarray(rng.normal(-1, 2, params["density"].shape).astype(np.float32))
    params["k0"] = jnp.asarray(rng.normal(0, 1, params["k0"].shape).astype(np.float32))
    # an 8x8 pixel patch of a 64x64 frame (real training samples patches of a
    # much larger frame; a full frame spans the whole NDC frustum and can
    # never fit one slice)
    Hf = Wf = 64
    K, c2w = _cam(Hf, Wf, f=60.0)
    ro, rd, vd = ray_ops.get_rays_of_a_view(Hf, Wf, K, c2w, ndc=True, inverse_y=False,
                                            flip_x=False, flip_y=False)
    sl = np.s_[28:36, 28:36]
    ro = jnp.asarray(np.asarray(ro)[sl].reshape(-1, 3))
    rd = jnp.asarray(np.asarray(rd)[sl].reshape(-1, 3))
    vd = jnp.asarray(np.asarray(vd)[sl].reshape(-1, 3))
    target = jnp.asarray(np.random.default_rng(7).uniform(size=(64, 3)).astype(np.float32))

    def loss_sweep(p):
        out = plane_sweep.sweep_patch_train(
            cfg, p, buffers, ro, rd, vd, stepsize=1.0, bg=0.5, patch=32,
            use_bf16=False,
        )
        return (jnp.mean((out["rgb_marched"] - target) ** 2)
                + jnp.sum(out["weights"] ** 2) * 1e-3
                + jnp.mean(out["raw_rgb"] * out["weights"][..., None]))

    def loss_fwd(p):
        out = dmpigo.forward(cfg, p, buffers, ro, rd, vd, stepsize=1.0, bg=0.5,
                             ndc_planes=True)
        return (jnp.mean((out["rgb_marched"] - target) ** 2)
                + jnp.sum(out["weights"] ** 2) * 1e-3
                + jnp.mean(out["raw_rgb"] * out["weights"][..., None]))

    v1, g1 = jax.value_and_grad(loss_sweep)(params)
    v2, g2 = jax.value_and_grad(loss_fwd)(params)
    assert np.allclose(float(v1), float(v2), rtol=1e-4), (float(v1), float(v2))
    for (k1, a), (k2, b) in zip(
        jax.tree_util.tree_flatten_with_path(g1)[0],
        jax.tree_util.tree_flatten_with_path(g2)[0],
    ):
        assert jax.tree_util.keystr(k1) == jax.tree_util.keystr(k2)
        a, b = np.asarray(a), np.asarray(b)
        assert np.allclose(a, b, atol=5e-5), (jax.tree_util.keystr(k1), np.abs(a - b).max())


def test_sweep_patch_train_bf16_grad_accuracy():
    """The SHIPPED joint-training default is use_bf16=True; validate its
    gradients against the f32 path (VERDICT round-1 item 3). bf16 matmuls
    with f32 accumulation: tolerate relative error ~1% of the gradient scale
    (bf16 has ~3 decimal digits; the loss surface is smooth here)."""
    from fourk_nerf_tpu.ops import plane_sweep

    cfg = dmpigo.make_config(
        xyz_min=[-1.3, -1.2, -1.0], xyz_max=[1.3, 1.2, 1.0],
        num_voxels=64 * 64 * 16, mpi_depth=16,
        fast_color_thres=1.0 / 16 / 5, rgbnet_dim=6, rgbnet_width=16,
    )
    params, buffers = dmpigo.init(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    params["density"] = jnp.asarray(rng.normal(-1, 2, params["density"].shape).astype(np.float32))
    params["k0"] = jnp.asarray(rng.normal(0, 1, params["k0"].shape).astype(np.float32))
    Hf = Wf = 64
    K, c2w = _cam(Hf, Wf, f=60.0)
    ro, rd, vd = ray_ops.get_rays_of_a_view(Hf, Wf, K, c2w, ndc=True, inverse_y=False,
                                            flip_x=False, flip_y=False)
    sl = np.s_[28:36, 28:36]
    ro = jnp.asarray(np.asarray(ro)[sl].reshape(-1, 3))
    rd = jnp.asarray(np.asarray(rd)[sl].reshape(-1, 3))
    vd = jnp.asarray(np.asarray(vd)[sl].reshape(-1, 3))
    target = jnp.asarray(np.random.default_rng(7).uniform(size=(64, 3)).astype(np.float32))

    def loss(p, use_bf16):
        out = plane_sweep.sweep_patch_train(
            cfg, p, buffers, ro, rd, vd, stepsize=1.0, bg=0.5, patch=32,
            use_bf16=use_bf16,
        )
        return jnp.mean(jnp.abs(out["rgb_marched"] - target))

    v16, g16 = jax.value_and_grad(lambda p: loss(p, True))(params)
    v32, g32 = jax.value_and_grad(lambda p: loss(p, False))(params)
    # loss value within bf16 tolerance
    assert abs(float(v16) - float(v32)) < 3e-3 * max(abs(float(v32)), 1e-3)
    # per-group gradients: cosine similarity and relative magnitude --
    # descent directions agree. The voxel-grid groups (density/k0) get
    # sparse 2-tap hat gradients of tiny per-entry magnitude, so their
    # relative bf16 rounding noise is larger than the MLP's: 0.98 cosine
    # there is rounding, not a different direction.
    for (k1, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(g16)[0],
        jax.tree_util.tree_flatten_with_path(g32)[0],
    ):
        name = jax.tree_util.keystr(k1)
        a = np.asarray(a).ravel().astype(np.float64)
        b = np.asarray(b).ravel().astype(np.float64)
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if nb < 1e-12:
            assert na < 1e-10, name
            continue
        cos = float(a @ b / (na * nb))
        assert cos > 0.98, (name, cos)
        assert abs(na / nb - 1.0) < 0.05, (name, na / nb)
    # whole-gradient descent direction
    ga = np.concatenate([np.asarray(x).ravel() for x in jax.tree.leaves(g16)])
    gb = np.concatenate([np.asarray(x).ravel() for x in jax.tree.leaves(g32)])
    ga, gb = ga.astype(np.float64), gb.astype(np.float64)
    gcos = float(ga @ gb / (np.linalg.norm(ga) * np.linalg.norm(gb)))
    assert gcos > 0.995, gcos


def test_render_frame_bf16_quality_delta_quantified():
    """Quantify the bf16 fast-render deviation vs the f32 sweep: published
    metrics use f32 (render_viewpoints), bf16 is for throughput -- its PSNR
    vs the f32 frame must still be high."""
    from fourk_nerf_tpu.ops import plane_sweep

    cfg, params, buffers = _scene()
    H, W = 24, 32
    K, c2w = _cam(H, W)
    f32 = plane_sweep.render_frame(cfg, params, buffers, H, W, K, c2w,
                                   stepsize=1.0, bg=0.5, tile=8, patch=24,
                                   use_bf16=False)
    b16 = plane_sweep.render_frame(cfg, params, buffers, H, W, K, c2w,
                                   stepsize=1.0, bg=0.5, tile=8, patch=24,
                                   use_bf16=True)
    mse = float(np.mean((np.asarray(f32["rgb_marched"])
                         - np.asarray(b16["rgb_marched"])) ** 2))
    psnr = -10 * np.log10(mse + 1e-12)
    assert psnr > 45.0, psnr

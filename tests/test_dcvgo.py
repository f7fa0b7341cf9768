import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fourk_nerf_tpu.models import dcvgo


def _tiny():
    cfg = dcvgo.make_config(
        xyz_min=[-2.0, -2.0, -2.0], xyz_max=[2.0, 2.0, 2.0],
        num_voxels=24**3, num_voxels_base=24**3, alpha_init=1e-2,
        fast_color_thres=1e-4, rgbnet_dim=4, rgbnet_width=16,
    )
    params, buffers = dcvgo.init(cfg, jax.random.PRNGKey(0))
    return cfg, params, buffers


def test_contraction_maps_world_into_shell():
    cfg, _, _ = _tiny()
    rng = np.random.default_rng(0)
    rays_o = jnp.asarray(rng.uniform(-0.2, 0.2, (8, 3)).astype(np.float32))
    rays_d = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    pts, inner, t = dcvgo.sample_ray(cfg, rays_o, rays_d, stepsize=1.0)
    p = np.asarray(pts)
    # everything must stay inside [-1-bg_len, 1+bg_len]
    assert np.all(np.abs(p) <= 1.0 + cfg.bg_len + 1e-5)
    # inner points have inf-norm <= 1 plus contraction leaves them untouched
    assert np.asarray(inner).any() and not np.asarray(inner).all()
    # outer samples map monotonically toward the shell boundary
    assert np.asarray(t).shape[0] == pts.shape[1]


def test_cumdist_keep_mask_matches_sequential_oracle():
    rng = np.random.default_rng(1)
    dist = rng.uniform(0, 0.1, size=(5, 20)).astype(np.float32)
    thres = 0.15
    got = np.asarray(dcvgo.cumdist_keep_mask(jnp.asarray(dist), thres))
    ref = np.zeros_like(dist, dtype=bool)
    for r in range(dist.shape[0]):
        cum = 0.0
        for k in range(dist.shape[1]):
            cum += dist[r, k]
            over = cum > thres
            if over:
                cum = 0.0
            ref[r, k] = over
    assert np.array_equal(got, ref)


def test_forward_shapes_and_finiteness():
    cfg, params, buffers = _tiny()
    rng = np.random.default_rng(2)
    rays_o = jnp.asarray(rng.uniform(-0.2, 0.2, (6, 3)).astype(np.float32))
    rays_d = jnp.asarray(rng.normal(size=(6, 3)).astype(np.float32))
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    out = dcvgo.forward(cfg, params, buffers, rays_o, rays_d, viewdirs,
                        stepsize=1.0, bg=1.0, render_depth=True)
    K = out["weights"].shape[1]
    assert out["rgb_marched"].shape == (6, 3)
    assert out["wsum_mid"].shape == (6,)
    assert out["t"].shape == (6, K)
    assert np.isfinite(np.asarray(out["rgb_marched"])).all()
    # s in [0, 1)
    s = np.asarray(out["s"])
    assert s.min() >= 0 and s.max() < 1


def test_gradients_flow():
    cfg, params, buffers = _tiny()
    rng = np.random.default_rng(3)
    rays_o = jnp.asarray(rng.uniform(-0.2, 0.2, (4, 3)).astype(np.float32))
    rays_d = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    params = {**params, "density": params["density"] + 1.0}

    def loss(p):
        out = dcvgo.forward(cfg, p, buffers, rays_o, rays_d, viewdirs, stepsize=1.0, bg=0.0)
        return jnp.mean(out["rgb_marched"] ** 2)

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["density"]).sum()) > 0
    assert float(jnp.abs(g["k0"]).sum()) > 0


def test_get_kwargs_roundtrip():
    cfg, _, _ = _tiny()
    cfg2 = dcvgo.make_config(**dcvgo.get_kwargs(cfg))
    assert cfg2.world_size == cfg.world_size
    assert cfg2.scene_center == cfg.scene_center
    assert abs(cfg2.voxel_size - cfg.voxel_size) < 1e-9


@pytest.mark.slow
def test_tensorf_grid_dispatch():
    """dcvgo accepts TensoRF grids like the reference's grid-type-generic
    create_grid (/root/reference/lib/grid.py:27-35)."""
    cfg = dcvgo.make_config(
        xyz_min=[-2.0, -2.0, -2.0], xyz_max=[2.0, 2.0, 2.0],
        num_voxels=24**3, num_voxels_base=24**3, alpha_init=1e-2,
        fast_color_thres=1e-4, rgbnet_dim=4, rgbnet_width=16,
        density_type="TensoRFGrid", k0_type="TensoRFGrid",
        density_config={"n_comp": 4}, k0_config={"n_comp": 4},
    )
    params, buffers = dcvgo.init(cfg, jax.random.PRNGKey(0))
    assert isinstance(params["density"], dict)  # TensoRF factor pytree
    rng = np.random.default_rng(0)
    rays_o = jnp.asarray(rng.uniform(-0.2, 0.2, (8, 3)).astype(np.float32))
    rays_d = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    vd = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    out = dcvgo.forward(cfg, params, buffers, rays_o, rays_d, vd, stepsize=1.0, bg=1.0)
    assert np.isfinite(np.asarray(out["rgb_marched"])).all()

    # gradients reach the TensoRF factors
    def loss(p):
        o = dcvgo.forward(cfg, p, buffers, rays_o, rays_d, vd, stepsize=1.0, bg=1.0)
        return jnp.mean(o["rgb_marched"] ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g["density"])
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)

    # maintenance ops run through the dispatch
    cfg2, p2, b2 = dcvgo.scale_volume_grid(cfg, params, buffers, 28**3)
    assert cfg2.world_size[0] > cfg.world_size[0]
    _ = dcvgo.update_occupancy_cache(cfg, params, buffers)
    _ = dcvgo.density_tv_grad(cfg, params, 1e-3, True, 8, None)

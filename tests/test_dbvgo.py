import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fourk_nerf_tpu.models import dbvgo


def _tiny():
    cfg = dbvgo.make_config(
        xyz_min=[-2.0, -2.0, -2.0], xyz_max=[2.0, 2.0, 2.0],
        num_voxels=16**3, num_voxels_base=16**3, alpha_init=1e-2,
        fast_color_thres=1e-4, rgbnet_dim=4, rgbnet_width=16,
    )
    params, buffers = dbvgo.init(cfg, jax.random.PRNGKey(0))
    return cfg, params, buffers


def _rays(n=6, seed=0):
    rng = np.random.default_rng(seed)
    ro = jnp.asarray(rng.uniform(-0.3, 0.3, (n, 3)).astype(np.float32))
    rd = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    return ro, rd, vd


def test_bg_points_live_in_shell():
    cfg, _, _ = _tiny()
    ro, rd, vd = _rays()
    o = (ro - jnp.asarray(cfg.scene_center)) / jnp.asarray(cfg.scene_radius)
    d = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    from fourk_nerf_tpu.ops import render

    _, t_max = render.ray_aabb(o, d, jnp.asarray(cfg.xyz_min), jnp.asarray(cfg.xyz_max),
                               0.0, 2 * np.sqrt(3))
    pts = dbvgo.sample_bg_pts(o, d, t_max, cfg.bg_preserve, cfg.n_samples_bg(0.5))
    # inverted-sphere warp keeps points inside the unit cube
    assert np.all(np.abs(np.asarray(pts)) <= 1.0 + 1e-4)


@pytest.mark.slow
def test_forward_composites_fg_over_bg():
    cfg, params, buffers = _tiny()
    ro, rd, vd = _rays()
    out = dbvgo.forward(cfg, params, buffers, ro, rd, vd, stepsize=0.5, bg=1.0,
                        render_depth=True)
    assert out["rgb_marched"].shape == (6, 3)
    assert np.isfinite(np.asarray(out["rgb_marched"])).all()
    # empty grids (alpha ~ alpha_init): mostly background color
    assert np.asarray(out["alphainv_last"]).min() > 0

    def loss(p):
        o = dbvgo.forward(cfg, p, buffers, ro, rd, vd, stepsize=0.5, bg=0.0)
        return jnp.mean(o["rgb_marched"] ** 2)

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["fg"]["density"]).sum()) > 0
    assert float(jnp.abs(g["bg"]["density"]).sum()) > 0


def test_get_kwargs_roundtrip():
    cfg, _, _ = _tiny()
    cfg2 = dbvgo.make_config(**dbvgo.get_kwargs(cfg))
    assert cfg2.world_size == cfg.world_size
    assert cfg2.bg_preserve == cfg.bg_preserve


@pytest.mark.slow
def test_tensorf_grid_dispatch_bivox():
    """dbvgo dual fields accept TensoRF grids (reference create_grid is
    grid-type-generic, /root/reference/lib/grid.py:27-35)."""
    import jax.numpy as jnp

    cfg = dbvgo.make_config(
        xyz_min=[-2.0, -2.0, -2.0], xyz_max=[2.0, 2.0, 2.0],
        num_voxels=20**3, num_voxels_base=20**3, alpha_init=1e-2,
        rgbnet_dim=4, rgbnet_width=16,
        density_type="TensoRFGrid", k0_type="TensoRFGrid",
        density_config={"n_comp": 4}, k0_config={"n_comp": 4},
    )
    params, buffers = dbvgo.init(cfg, jax.random.PRNGKey(0))
    assert isinstance(params["fg"]["density"], dict)
    rng = np.random.default_rng(0)
    rays_o = jnp.asarray(rng.uniform(-0.2, 0.2, (8, 3)).astype(np.float32))
    rays_d = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    vd = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    out = dbvgo.forward(cfg, params, buffers, rays_o, rays_d, vd, stepsize=1.0, bg=1.0)
    assert np.isfinite(np.asarray(out["rgb_marched"])).all()

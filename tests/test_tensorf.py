import numpy as np
import jax
import jax.numpy as jnp

from fourk_nerf_tpu.models import common, dmpigo
from fourk_nerf_tpu.ops import tensorf


def test_tensorf_query_matches_dense_materialization():
    key = jax.random.PRNGKey(0)
    params = tensorf.init_tensorf(key, channels=4, world_size=(6, 7, 8), n_comp=3)
    dense = tensorf.tensorf_dense(params, channels=4)  # [6,7,8,4]
    # querying exactly at lattice points must reproduce the dense grid
    ii, jj, kk = np.meshgrid(np.arange(6), np.arange(7), np.arange(8), indexing="ij")
    ind01 = np.stack([ii / 5, jj / 6, kk / 7], -1).astype(np.float32)
    q = tensorf.tensorf_query(params, jnp.asarray(ind01))
    assert np.allclose(np.asarray(q), np.asarray(dense), atol=1e-4)


def test_tensorf_single_channel():
    params = tensorf.init_tensorf(jax.random.PRNGKey(1), channels=1, world_size=(5, 5, 5), n_comp=2)
    assert "f_vec" not in params
    q = tensorf.tensorf_query(params, jnp.asarray([[0.5, 0.5, 0.5]]))
    assert q.shape == (1, 1)
    dense = tensorf.tensorf_dense(params, channels=1)
    assert dense.shape == (5, 5, 5, 1)


def test_tensorf_resize_keeps_corner_values():
    params = tensorf.init_tensorf(jax.random.PRNGKey(2), channels=2, world_size=(4, 4, 4), n_comp=2)
    up = tensorf.tensorf_resize(params, (8, 8, 8))
    assert up["xy_plane"].shape == (8, 8, 2)
    assert up["x_vec"].shape == (8, 2)
    # align_corners: first/last rows preserved
    assert np.allclose(np.asarray(up["xy_plane"][0, 0]), np.asarray(params["xy_plane"][0, 0]), atol=1e-6)
    assert np.allclose(np.asarray(up["x_vec"][-1]), np.asarray(params["x_vec"][-1]), atol=1e-6)


def test_tensorf_tv_loss_grad_finite():
    params = tensorf.init_tensorf(jax.random.PRNGKey(3), channels=2, world_size=(4, 4, 4), n_comp=2)
    g = jax.grad(lambda p: tensorf.tensorf_tv_loss(p, 1.0, 1.0, 1.0))(params)
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
    assert float(jnp.abs(g["xy_plane"]).sum()) > 0
    # f_vec has no TV term
    assert float(jnp.abs(g["f_vec"]).sum()) == 0


def test_dmpigo_with_tensorf_k0():
    cfg = dmpigo.make_config(
        xyz_min=[-1, -1, 0], xyz_max=[1, 1, 1], num_voxels=16 * 16 * 8, mpi_depth=8,
        rgbnet_dim=4, rgbnet_width=16, k0_type="TensoRFGrid", k0_config={"n_comp": 3},
        fast_color_thres=0.0,
    )
    params, buffers = dmpigo.init(cfg, jax.random.PRNGKey(0))
    assert "xy_plane" in params["k0"]
    rng = np.random.default_rng(0)
    rays_o = jnp.asarray(np.concatenate([rng.uniform(-0.5, 0.5, (4, 2)), np.zeros((4, 1))], -1), dtype=jnp.float32)
    rays_d = jnp.asarray(np.concatenate([rng.uniform(-0.1, 0.1, (4, 2)), np.ones((4, 1))], -1), dtype=jnp.float32)
    vd = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    out = dmpigo.forward(cfg, params, buffers, rays_o, rays_d, vd, stepsize=1.0, bg=0.0)
    assert np.isfinite(np.asarray(out["rgb_marched"])).all()

    def loss(p):
        o = dmpigo.forward(cfg, p, buffers, rays_o, rays_d, vd, stepsize=1.0, bg=0.0)
        return jnp.mean(o["rgb_marched"] ** 2)

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["k0"]["xy_plane"]).sum()) > 0
    # config round-trips through get_kwargs with the dict restored
    kwargs = dmpigo.get_kwargs(cfg)
    assert kwargs["k0_config"] == {"n_comp": 3}
    cfg2 = dmpigo.make_config(**kwargs)
    assert cfg2.k0_config == cfg.k0_config

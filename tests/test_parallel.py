"""Distributed tests on the 8-device virtual CPU mesh (SURVEY.md section 4:
sharded render must equal the single-device render)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fourk_nerf_tpu.models import dmpigo
from fourk_nerf_tpu.parallel import mesh as pmesh


@pytest.fixture(scope="module")
def scene():
    cfg = dmpigo.make_config(
        xyz_min=[-1, -1, 0], xyz_max=[1, 1, 1], num_voxels=16 * 16 * 8, mpi_depth=8,
        fast_color_thres=1e-4, rgbnet_dim=4, rgbnet_width=16,
    )
    params, buffers = dmpigo.init(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    params["density"] = jnp.asarray(rng.normal(0, 1, params["density"].shape).astype(np.float32))
    params["k0"] = jnp.asarray(rng.normal(0, 1, params["k0"].shape).astype(np.float32))
    n = 64
    ro = jnp.asarray(np.concatenate([rng.uniform(-0.5, 0.5, (n, 2)), np.full((n, 1), -1.0)], -1), dtype=jnp.float32)
    rd = jnp.asarray(np.concatenate([rng.uniform(-0.1, 0.1, (n, 2)), np.full((n, 1), 2.0)], -1), dtype=jnp.float32)
    vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    return cfg, params, buffers, ro, rd, vd


def test_mesh_construction():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual CPU devices"
    m = pmesh.make_mesh(n_data=4, n_grid=2)
    assert m.axis_names == ("data", "grid")
    assert m.devices.shape == (4, 2)


def test_data_parallel_render_matches_single_device(scene):
    cfg, params, buffers, ro, rd, vd = scene
    ref = np.asarray(dmpigo.forward(cfg, params, buffers, ro, rd, vd,
                                    stepsize=1.0, bg=0.5)["rgb_marched"])

    m = pmesh.make_mesh(n_data=8, n_grid=1)
    batch_sh = pmesh.shard_batch(m)
    rep = pmesh.replicate(m)
    params_r = jax.device_put(params, rep)
    buffers_r = jax.device_put(buffers, rep)
    ro_s, rd_s, vd_s = (jax.device_put(x, batch_sh) for x in (ro, rd, vd))

    fwd = jax.jit(lambda p, b, a1, a2, a3: dmpigo.forward(
        cfg, p, b, a1, a2, a3, stepsize=1.0, bg=0.5)["rgb_marched"])
    with m:
        out = fwd(params_r, buffers_r, ro_s, rd_s, vd_s)
    assert np.allclose(np.asarray(out), ref, atol=1e-5)


def test_grid_sharded_render_matches(scene):
    """Voxel grids spatially sharded along X (TP analogue): XLA inserts the
    halo/gather collectives; result must be identical."""
    cfg, params, buffers, ro, rd, vd = scene
    ref = np.asarray(dmpigo.forward(cfg, params, buffers, ro, rd, vd,
                                    stepsize=1.0, bg=0.5)["rgb_marched"])
    m = pmesh.make_mesh(n_data=4, n_grid=2)
    params_s = pmesh.shard_grid_params(m, params)
    buffers_r = jax.device_put(buffers, pmesh.replicate(m))
    ro_s, rd_s, vd_s = (jax.device_put(x, pmesh.shard_batch(m)) for x in (ro, rd, vd))
    fwd = jax.jit(lambda p, b, a1, a2, a3: dmpigo.forward(
        cfg, p, b, a1, a2, a3, stepsize=1.0, bg=0.5)["rgb_marched"])
    with m:
        out = fwd(params_s, buffers_r, ro_s, rd_s, vd_s)
    assert np.allclose(np.asarray(out), ref, atol=1e-5)


def test_replica_consistency_check(scene):
    from fourk_nerf_tpu.utils import misc

    cfg, params, buffers, *_ = scene
    m = pmesh.make_mesh(n_data=8, n_grid=1)
    rep = jax.device_put(params, pmesh.replicate(m))
    misc.check_replica_consistency(rep)  # must not raise


def test_plane_sweep_frame_sharded_matches():
    """The production full-frame plane sweep under a (data x grid) mesh ==
    single-device (tiles DP + voxel grids spatially sharded)."""
    import numpy as np

    from fourk_nerf_tpu.ops import plane_sweep

    # plane-aligned NDC scene (z-bbox must be [-1, 1] with n_samples ==
    # mpi_depth for the sweep's fast-path conditions to hold)
    cfg = dmpigo.make_config(
        xyz_min=[-1, -1, -1], xyz_max=[1, 1, 1], num_voxels=16 * 16 * 8,
        mpi_depth=8, fast_color_thres=1e-4, rgbnet_dim=4, rgbnet_width=16,
    )
    params, buffers = dmpigo.init(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    params["density"] = jnp.asarray(
        rng.normal(0, 1, params["density"].shape).astype(np.float32))
    params["k0"] = jnp.asarray(
        rng.normal(0, 1, params["k0"].shape).astype(np.float32))
    H = W = 16
    f = 24.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], dtype=np.float32)
    c2w = np.eye(4, dtype=np.float32)[:3, :4]
    c2w[2, 3] = 1.0
    ref = plane_sweep.render_frame(cfg, params, buffers, H, W, K, c2w,
                                   stepsize=1.0, bg=1.0, tile=4, patch=16,
                                   use_bf16=False)
    m = pmesh.make_mesh(n_data=4, n_grid=2)
    params_s = pmesh.shard_grid_params(m, params)
    buffers_r = jax.device_put(buffers, pmesh.replicate(m))
    with m:
        out = plane_sweep.render_frame(cfg, params_s, buffers_r, H, W, K, c2w,
                                       stepsize=1.0, bg=1.0, tile=4, patch=16,
                                       use_bf16=False)
    np.testing.assert_allclose(np.asarray(out["rgb_marched"]),
                               np.asarray(ref["rgb_marched"]), atol=1e-5)


@pytest.mark.slow
def test_joint_gd_step_sharded_matches():
    """The PRODUCTION joint G+D train step (sweep path, TV, GAN) DP-sharded
    over the 8-device mesh == single-device (VERDICT round-1 item 4)."""
    import numpy as np
    import __graft_entry__ as ge

    # _joint_setup builds the step with donate=False (state is reused below)
    model_cfg, train_step, state, batch, lrs = ge._joint_setup()
    key = jax.random.PRNGKey(7)
    density0 = np.asarray(state[0]["density"]).copy()
    sr_leaf0 = np.asarray(jax.tree.leaves(state[3])[0]).copy()
    ref = train_step(*state[:3], *state[3:], batch, lrs, key,
                     apply_tv=True, tv_dense=True)
    m = pmesh.make_mesh(n_data=8, n_grid=1)
    rep = pmesh.replicate(m)
    bsh = pmesh.shard_batch(m)
    state_r = jax.device_put(state, rep)
    batch_s = (*(jax.device_put(x, bsh) for x in batch[:4]),
               jax.device_put(batch[4], rep), jax.device_put(batch[5], rep))
    with m:
        out = train_step(*state_r[:3], *state_r[3:], batch_s, lrs, key,
                         apply_tv=True, tv_dense=True)
    # bf16 production step + sharded reduction reorder: compare one-step
    # UPDATE deltas (magnitude ~lr) rather than absolute params with a
    # loose atol (which would exceed the signal). Direction must agree
    # almost exactly; a few bf16-sensitive voxels may flip Adam sign.
    ref_d_delta = np.asarray(ref[0]["density"]) - density0
    out_d_delta = np.asarray(out[0]["density"]) - density0
    cos = float(out_d_delta.ravel() @ ref_d_delta.ravel()) / (
        np.linalg.norm(out_d_delta) * np.linalg.norm(ref_d_delta) + 1e-12)
    assert cos > 0.999, cos
    assert float(np.percentile(np.abs(out_d_delta - ref_d_delta), 99)) < 1e-3
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(out[2])[0]) - sr_leaf0,
        np.asarray(jax.tree.leaves(ref[2])[0]) - sr_leaf0, atol=1e-5)


def test_all_reduce_dict_means_across_devices():
    import numpy as np

    m = pmesh.make_mesh(n_data=8, n_grid=1)
    vals = {"a": np.arange(8, dtype=np.float32),
            "b": np.float32(3.0)}  # host scalar = replicated
    red = pmesh.all_reduce_dict(m, vals)
    assert abs(float(red["a"]) - 3.5) < 1e-6
    assert abs(float(red["b"]) - 3.0) < 1e-6


def test_tile_process_sharded_matches():
    """4K-tile SR inference with the tile batch data-parallel over the mesh
    == the single-device scan (tiles are independent; halo baked per tile)."""
    from fourk_nerf_tpu.models import sr_esrnet

    sr_model = sr_esrnet.SFTNet(n_in_colors=3, scale=4, num_feat=8,
                                num_block=1, num_grow_ch=8, num_cond=1)
    rng = np.random.default_rng(11)
    sr_params = sr_model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)),
        jnp.zeros((1, 8, 8, 1)))["params"]
    img = jnp.asarray(rng.uniform(0, 1, (1, 36, 52, 3)).astype(np.float32))
    cond = jnp.asarray(rng.uniform(0, 1, (1, 36, 52, 1)).astype(np.float32))
    apply = lambda p, x, c: sr_model.apply({"params": p}, x, c)
    ref = sr_esrnet.tile_process(apply, sr_params, img, cond,
                                 tile_size=16, tile_pad=4)
    mesh = pmesh.make_mesh(n_data=len(jax.devices()), n_grid=1)
    got = sr_esrnet.tile_process_sharded(apply, sr_params, img, cond,
                                         tile_size=16, mesh=mesh, tile_pad=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

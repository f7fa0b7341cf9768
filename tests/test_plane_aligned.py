"""Plane-aligned NDC fast path must match the general trilinear path exactly."""

import numpy as np
import jax
import jax.numpy as jnp

from fourk_nerf_tpu.models import dmpigo
from fourk_nerf_tpu.ops import grid_sample, rays as ray_ops


def _ndc_scene(D=8, seed=0):
    # z-bbox exactly [-1, 1] as produced by compute_bbox on NDC rays
    cfg = dmpigo.make_config(
        xyz_min=[-1.2, -1.1, -1.0], xyz_max=[1.2, 1.1, 1.0],
        num_voxels=16 * 16 * D, mpi_depth=D,
        fast_color_thres=1e-4, rgbnet_dim=4, rgbnet_width=16,
    )
    params, buffers = dmpigo.init(cfg, jax.random.PRNGKey(seed))
    rng = np.random.default_rng(seed)
    params["density"] = jnp.asarray(rng.normal(0, 1, params["density"].shape).astype(np.float32))
    params["k0"] = jnp.asarray(rng.normal(0, 1, params["k0"].shape).astype(np.float32))
    return cfg, params, buffers


def _real_ndc_rays(n=32, seed=1):
    H, W, f = 24, 32, 30.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], dtype=np.float32)
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 1.0  # camera at z=1 looking down -z
    ro, rd, vd = ray_ops.get_rays_of_a_view(
        H, W, K, c2w[:3, :4], ndc=True, inverse_y=False, flip_x=False, flip_y=False
    )
    ro = np.asarray(ro).reshape(-1, 3)
    rd = np.asarray(rd).reshape(-1, 3)
    vd = np.asarray(vd).reshape(-1, 3)
    sel = np.random.default_rng(seed).choice(len(ro), n, replace=False)
    return jnp.asarray(ro[sel]), jnp.asarray(rd[sel]), jnp.asarray(vd[sel])


def test_ndc_rays_have_unit_z_span():
    ro, rd, _ = _real_ndc_rays()
    assert np.allclose(np.asarray(ro)[:, 2], -1.0, atol=1e-6)
    assert np.allclose(np.asarray(rd)[:, 2], 2.0, atol=1e-6)


def test_plane_aligned_ok_detection():
    cfg, _, _ = _ndc_scene()
    assert dmpigo.plane_aligned_ok(cfg, 1.0, ndc=True)
    assert not dmpigo.plane_aligned_ok(cfg, 0.5, ndc=True)
    assert not dmpigo.plane_aligned_ok(cfg, 1.0, ndc=False)


def test_plane_aligned_forward_matches_general():
    cfg, params, buffers = _ndc_scene()
    ro, rd, vd = _real_ndc_rays()
    out_gen = dmpigo.forward(cfg, params, buffers, ro, rd, vd, stepsize=1.0, bg=0.5,
                             render_depth=True, ndc_planes=False)
    out_fast = dmpigo.forward(cfg, params, buffers, ro, rd, vd, stepsize=1.0, bg=0.5,
                              render_depth=True, ndc_planes=True)
    for k in ("rgb_marched", "weights", "alphainv_last", "depth"):
        a, b = np.asarray(out_gen[k]), np.asarray(out_fast[k])
        assert np.allclose(a, b, atol=2e-5), (k, np.abs(a - b).max())


def test_plane_aligned_gather_matches_trilinear():
    rng = np.random.default_rng(2)
    grid = jnp.asarray(rng.normal(size=(6, 7, 5, 3)).astype(np.float32))
    N, K = 10, 5
    xy = jnp.asarray(rng.uniform(0, 1, (N, K, 2)).astype(np.float32))
    z = (jnp.arange(K, dtype=jnp.float32) / (K - 1))[None, :, None]
    ind01 = jnp.concatenate([xy, jnp.broadcast_to(z, (N, K, 1))], axis=-1)
    ref = grid_sample.trilinear_sample(grid, ind01)
    fast = grid_sample.trilinear_sample_plane_aligned(grid, xy)
    assert np.allclose(np.asarray(fast), np.asarray(ref), atol=1e-5)

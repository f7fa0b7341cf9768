"""Bounded-scene brick-sweep renderer == chunked-gather dvgo.forward
(SURVEY.md section 4: fast paths must match the exact path)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fourk_nerf_tpu.models import dvgo
from fourk_nerf_tpu.ops import box_sweep, rays as ray_ops


def _scene(rng, *, rgbnet_dim=6, fast_color_thres=1e-4, mask_res=None,
           world=(24, 20, 16), sparse_mask=True):
    kw = dict(mask_cache_world_size=mask_res) if mask_res else {}
    cfg = dvgo.make_config(
        xyz_min=[-1.0, -0.8, -0.6], xyz_max=[1.0, 0.9, 0.7],
        num_voxels=int(np.prod(world)), num_voxels_base=int(np.prod(world)),
        alpha_init=1e-2, rgbnet_dim=rgbnet_dim, rgbnet_width=16,
        rgbnet_depth=3, fast_color_thres=fast_color_thres, **kw,
    )
    params, buffers = dvgo.init(cfg, jax.random.PRNGKey(0))
    dens = rng.normal(0.0, 2.0, params["density"].shape).astype(np.float32)
    # Empty 1-voxel margin (like any trained bounded scene, where the bbox is
    # fitted with slack): a ray's first/last samples sit EXACTLY on the bbox
    # faces, and their in-bbox test is a knife-edge that f32 rounding can
    # resolve differently across jit programs.  With content at the boundary
    # this flips the inclusion of a sample with real alpha; with an empty
    # margin (the realistic case) the boundary samples are ~transparent and
    # both paths agree to f32 tolerance.
    dens[0, :, :] = dens[-1, :, :] = -8.0
    dens[:, 0, :] = dens[:, -1, :] = -8.0
    dens[:, :, 0] = dens[:, :, -1] = -8.0
    params["density"] = jnp.asarray(dens)
    params["k0"] = jnp.asarray(
        rng.normal(0.0, 1.0, params["k0"].shape).astype(np.float32))
    if sparse_mask:
        m = rng.uniform(size=buffers["mask_cache"].shape) > 0.3
        buffers["mask_cache"] = jnp.asarray(m)
    return cfg, params, buffers


def _camera(H, W, *, dist=2.5, angle=(0.4, 0.3)):
    """Simple look-at-origin pinhole camera."""
    ax, ay = angle
    Rx = np.array([[1, 0, 0], [0, np.cos(ax), -np.sin(ax)],
                   [0, np.sin(ax), np.cos(ax)]])
    Ry = np.array([[np.cos(ay), 0, np.sin(ay)], [0, 1, 0],
                   [-np.sin(ay), 0, np.cos(ay)]])
    R = (Ry @ Rx).astype(np.float32)
    c2w = np.eye(4, dtype=np.float32)[:3, :4]
    c2w[:3, :3] = R
    # -z-forward convention: camera at +dist along its z axis looks at origin
    c2w[:3, 3] = R @ np.array([0, 0, dist], dtype=np.float32)
    f = 0.9 * W
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], dtype=np.float32)
    return K, c2w


def _chunked(cfg, params, buffers, H, W, K, c2w, *, stepsize, near, bg):
    ro, rd, vd = ray_ops.get_rays_of_a_view(H, W, K, c2w, ndc=False,
                                            inverse_y=False, flip_x=False,
                                            flip_y=False)
    flat = lambda x: jnp.asarray(np.asarray(x).reshape(-1, 3))
    with jax.default_matmul_precision("highest"):
        out = dvgo.forward(cfg, params, buffers, flat(ro), flat(rd), flat(vd),
                           stepsize=stepsize, near=near, far=1e9, bg=bg,
                           render_depth=True)
    return {k: np.asarray(v).reshape(H, W, -1).squeeze()
            for k, v in out.items()
            if k in ("rgb_marched", "depth", "alphainv_last")}


@pytest.mark.parametrize("mask_res,rgbnet_dim", [
    (None, 6),      # channel-mode mask, MLP
    ((12, 10, 8), 6),  # native-resolution mask (coarse cache)
    (None, 0),      # no MLP (coarse-stage colors)
])
def test_box_sweep_matches_chunked(mask_res, rgbnet_dim):
    rng = np.random.default_rng(3)
    cfg, params, buffers = _scene(rng, rgbnet_dim=rgbnet_dim,
                                  mask_res=mask_res)
    H, W = 20, 28  # not tile multiples: exercises edge padding
    K, c2w = _camera(H, W)
    ref = _chunked(cfg, params, buffers, H, W, K, c2w,
                   stepsize=0.5, near=0.2, bg=0.7)
    # non-vacuous: the camera must actually see scene content
    assert float(np.abs(ref["rgb_marched"] - 0.7).max()) > 0.05
    out = box_sweep.render_frame_box(
        cfg, params, buffers, H, W, K, c2w, stepsize=0.5, near=0.2, bg=0.7,
        use_bf16=False, tile=8)
    np.testing.assert_allclose(np.asarray(out["rgb_marched"]),
                               ref["rgb_marched"], atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["alphainv_last"]),
                               ref["alphainv_last"], atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["depth"]), ref["depth"],
                               atol=2e-5)


def test_box_sweep_oblique_camera():
    """Grazing/oblique view: footprints elongated along one axis."""
    rng = np.random.default_rng(11)
    cfg, params, buffers = _scene(rng)
    H, W = 16, 16
    K, c2w = _camera(H, W, dist=3.0, angle=(1.2, 0.9))
    ref = _chunked(cfg, params, buffers, H, W, K, c2w,
                   stepsize=0.5, near=0.2, bg=0.0)
    out = box_sweep.render_frame_box(
        cfg, params, buffers, H, W, K, c2w, stepsize=0.5, near=0.2, bg=0.0,
        use_bf16=False, tile=8)
    np.testing.assert_allclose(np.asarray(out["rgb_marched"]),
                               ref["rgb_marched"], atol=2e-5)


@pytest.mark.parametrize("angle", [
    (0.0, 0.0),    # -z approach
    (0.0, np.pi),  # +z approach (flipped sweep)
    (0.0, 0.5 * np.pi),   # x-major
    (0.0, -0.5 * np.pi),  # x-major, other sign
    (0.5 * np.pi, 0.0),   # y-major
    (-0.5 * np.pi, 0.2),  # y-major, other sign
])
def test_box_sweep_every_axis(angle):
    """Each world axis (both signs) as the sweep's major axis."""
    rng = np.random.default_rng(13)
    cfg, params, buffers = _scene(rng)
    H, W = 16, 24
    K, c2w = _camera(H, W, dist=2.8, angle=angle)
    ref = _chunked(cfg, params, buffers, H, W, K, c2w,
                   stepsize=0.5, near=0.2, bg=0.3)
    out = box_sweep.render_frame_box(
        cfg, params, buffers, H, W, K, c2w, stepsize=0.5, near=0.2, bg=0.3,
        use_bf16=False, tile=8)
    np.testing.assert_allclose(np.asarray(out["rgb_marched"]),
                               ref["rgb_marched"], atol=3e-5)
    np.testing.assert_allclose(np.asarray(out["alphainv_last"]),
                               ref["alphainv_last"], atol=3e-5)


def test_box_sweep_empty_scene_background():
    """All-masked scene: pure background frame, alphainv == 1."""
    rng = np.random.default_rng(5)
    cfg, params, buffers = _scene(rng)
    buffers["mask_cache"] = jnp.zeros_like(buffers["mask_cache"])
    H, W = 16, 16
    K, c2w = _camera(H, W)
    out = box_sweep.render_frame_box(
        cfg, params, buffers, H, W, K, c2w, stepsize=0.5, near=0.2, bg=0.25,
        use_bf16=False, tile=8)
    np.testing.assert_allclose(np.asarray(out["rgb_marched"]), 0.25, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["alphainv_last"]), 1.0, atol=1e-6)


def test_box_sweep_bf16_close():
    """bf16 fast mode stays within bf16-grade error of f32."""
    rng = np.random.default_rng(7)
    cfg, params, buffers = _scene(rng)
    H, W = 16, 16
    K, c2w = _camera(H, W)
    f32 = box_sweep.render_frame_box(
        cfg, params, buffers, H, W, K, c2w, stepsize=0.5, near=0.2, bg=0.5,
        use_bf16=False, tile=8)
    b16 = box_sweep.render_frame_box(
        cfg, params, buffers, H, W, K, c2w, stepsize=0.5, near=0.2, bg=0.5,
        use_bf16=True, tile=8)
    err = np.abs(np.asarray(f32["rgb_marched"]) - np.asarray(b16["rgb_marched"]))
    assert float(np.median(err)) < 2e-2, float(np.median(err))

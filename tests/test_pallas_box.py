"""Pallas fused slab-sweep kernel vs the XLA slab sweep (interpret mode).

The kernel replaces the reference's fused bounded-scene CUDA pipeline
(/root/reference/lib/cuda/render_utils_kernel.cu:144-707); parity target is
ops/box_sweep.py, itself parity-tested against the reference-exact chunked
forward (tests/test_box_sweep.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fourk_nerf_tpu.ops import box_sweep, pallas_box
from test_box_sweep import _scene, _camera


def _pair(cfg, params, buffers, H, W, K, c2w, *, bg, early_exit=True,
          tile=8, stepsize=0.5):
    ref = box_sweep.render_frame_box(
        cfg, params, buffers, H, W, K, c2w, stepsize=stepsize, near=0.2,
        bg=bg, use_bf16=False, tile=tile)
    got = pallas_box.render_frame_box_pallas(
        cfg, params, buffers, H, W, K, c2w, stepsize=stepsize, near=0.2,
        bg=bg, use_bf16=False, tile=tile, early_exit=early_exit,
        interpret=True)
    return ref, got


@pytest.mark.parametrize("rgbnet_dim,early_exit", [
    (6, True), (6, False), (0, True)])
def test_pallas_box_matches_xla_sweep(rgbnet_dim, early_exit):
    rng = np.random.default_rng(3)
    cfg, params, buffers = _scene(rng, rgbnet_dim=rgbnet_dim)
    H, W = 20, 28
    K, c2w = _camera(H, W)
    ref, got = _pair(cfg, params, buffers, H, W, K, c2w, bg=0.7,
                     early_exit=early_exit)
    assert float(np.abs(np.asarray(ref["rgb_marched"]) - 0.7).max()) > 0.05
    for key in ("rgb_marched", "depth", "alphainv_last"):
        a, b = np.asarray(got[key]), np.asarray(ref[key])
        assert np.allclose(a, b, atol=2e-4), (key, np.abs(a - b).max())


@pytest.mark.parametrize("angle", [
    (0.0, np.pi),          # flipped sweep axis
    (0.0, 0.5 * np.pi),    # x-major
    (-0.5 * np.pi, 0.2),   # y-major, negative sign
])
def test_pallas_box_axes(angle):
    rng = np.random.default_rng(13)
    cfg, params, buffers = _scene(rng)
    H, W = 16, 24
    K, c2w = _camera(H, W, dist=2.8, angle=angle)
    ref, got = _pair(cfg, params, buffers, H, W, K, c2w, bg=0.3)
    a, b = np.asarray(got["rgb_marched"]), np.asarray(ref["rgb_marched"])
    assert np.allclose(a, b, atol=2e-4), np.abs(a - b).max()


def test_pallas_box_empty_scene():
    rng = np.random.default_rng(5)
    cfg, params, buffers = _scene(rng)
    buffers["mask_cache"] = jnp.zeros_like(buffers["mask_cache"])
    H, W = 16, 16
    K, c2w = _camera(H, W)
    got = pallas_box.render_frame_box_pallas(
        cfg, params, buffers, H, W, K, c2w, stepsize=0.5, near=0.2, bg=0.25,
        use_bf16=False, tile=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got["rgb_marched"]), 0.25,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(got["alphainv_last"]), 1.0,
                               atol=1e-6)


def test_pallas_box_native_mask_refused():
    """Kernel requires the channel-packed (matching-resolution) mask."""
    rng = np.random.default_rng(7)
    cfg, params, buffers = _scene(rng, mask_res=(12, 10, 8))
    H, W = 16, 16
    K, c2w = _camera(H, W)
    with pytest.raises(ValueError):
        pallas_box.render_frame_box_pallas(
            cfg, params, buffers, H, W, K, c2w, stepsize=0.5, near=0.2,
            bg=0.5, use_bf16=False, tile=8, interpret=True)

"""Native C++ grid-ops vs the JAX kernels: independent implementations of the
same reference semantics must agree."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

native = pytest.importorskip("fourk_nerf_tpu.native")

from fourk_nerf_tpu.models import dcvgo  # noqa: E402
from fourk_nerf_tpu.ops import grid_sample, render  # noqa: E402
from fourk_nerf_tpu.train import optim  # noqa: E402


def test_native_builds_and_trilinear_matches_jax():
    rng = np.random.default_rng(0)
    grid = rng.normal(size=(5, 6, 7, 3)).astype(np.float32)
    pts = rng.uniform(-0.1, 1.1, size=(200, 3)).astype(np.float32)  # incl. out of range
    ours = native.trilinear_sample(grid, pts)
    ref = np.asarray(grid_sample.trilinear_sample(jnp.asarray(grid), jnp.asarray(pts)))
    assert np.allclose(ours, ref, atol=1e-5)


def test_native_alpha2weight_matches_jax():
    rng = np.random.default_rng(1)
    alpha = rng.uniform(0, 0.6, size=(16, 24)).astype(np.float32)
    valid = rng.uniform(size=(16, 24)) > 0.3
    w_n, ail_n = native.alpha2weight(alpha, valid)
    w_j, ail_j, _ = render.alpha2weight(jnp.asarray(alpha), jnp.asarray(valid))
    assert np.allclose(w_n, np.asarray(w_j), atol=1e-6)
    assert np.allclose(ail_n, np.asarray(ail_j), atol=1e-6)


def test_native_tv_grad_matches_jax():
    rng = np.random.default_rng(2)
    grid = rng.normal(size=(4, 5, 6, 2)).astype(np.float32)
    ours = native.tv_grad(grid, 0.3, 0.5, 0.7)
    ref = np.asarray(render.total_variation_grad(jnp.asarray(grid), 0.3, 0.5, 0.7))
    assert np.allclose(ours, ref, atol=1e-5)


def test_native_mask_lookup_matches_jax():
    rng = np.random.default_rng(3)
    mask = rng.uniform(size=(6, 7, 8)) < 0.5
    xyz = rng.uniform(-1.5, 1.5, size=(300, 3)).astype(np.float32)
    mn, mx = np.full(3, -1.0, np.float32), np.full(3, 1.0, np.float32)
    ours = native.mask_lookup(mask, xyz, mn, mx)
    ref = np.asarray(grid_sample.nearest_mask_lookup(
        jnp.asarray(mask), jnp.asarray(xyz), jnp.asarray(mn), jnp.asarray(mx)
    ))
    assert np.array_equal(ours, ref)


def test_native_cumdist_matches_jax():
    rng = np.random.default_rng(4)
    dist = rng.uniform(0, 0.1, size=(8, 30)).astype(np.float32)
    ours = native.cumdist_thres(dist, 0.15)
    ref = np.asarray(dcvgo.cumdist_keep_mask(jnp.asarray(dist), 0.15))
    assert np.array_equal(ours, ref)


def test_native_adam_matches_jax():
    rng = np.random.default_rng(5)
    p = rng.normal(size=(32,)).astype(np.float32)
    g = rng.normal(size=(32,)).astype(np.float32)
    g[::3] = 0.0
    m = np.zeros_like(p)
    v = np.zeros_like(p)
    p_native = p.copy()
    native.adam_step(p_native, g, m, v, step=1, lr=0.1, mode=1)

    params = {"density": jnp.asarray(p)}
    state = optim.init_state(params)
    new_params, _ = optim.apply_updates(
        params, {"density": jnp.asarray(g)}, state, {"density": 0.1},
        skip_zero_grad=frozenset({"density"}),
    )
    assert np.allclose(p_native, np.asarray(new_params["density"]), atol=1e-6)

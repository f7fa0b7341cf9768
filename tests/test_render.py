import numpy as np
import jax
import jax.numpy as jnp

from fourk_nerf_tpu.ops import render


pytestmark = __import__('pytest').mark.smoke

# ---------------------------------------------------------------------------
# raw2alpha
# ---------------------------------------------------------------------------

def test_raw2alpha_closed_form():
    d = jnp.array([-5.0, 0.0, 2.0, 20.0])
    shift, interval = 0.3, 0.5
    out = np.asarray(render.raw2alpha(d, shift, interval))
    e = np.exp(np.asarray(d, dtype=np.float64) + shift)
    ref = 1.0 - (1.0 + e) ** (-interval)
    assert np.allclose(out, ref, atol=5e-6)


def test_raw2alpha_gradient_matches_reference_backward():
    # reference backward: interval * (1+e)^(-interval-1) * e
    # (/root/reference/lib/cuda/render_utils_kernel.cu:507-516)
    d = jnp.array([-3.0, 0.0, 1.5])
    shift, interval = 0.1, 0.7
    g = jax.grad(lambda x: jnp.sum(render.raw2alpha(x, shift, interval)))(d)
    e = np.exp(np.asarray(d, dtype=np.float64) + shift)
    ref = interval * (1 + e) ** (-interval - 1) * e
    assert np.allclose(np.asarray(g), ref, atol=2e-5)


def test_raw2alpha_stable_at_large_density():
    d = jnp.array([100.0])
    out = render.raw2alpha(d, 0.0, 0.5)
    assert np.allclose(np.asarray(out), 1.0)
    g = jax.grad(lambda x: jnp.sum(render.raw2alpha(x, 0.0, 0.5)))(d)
    assert np.isfinite(np.asarray(g)).all()


# ---------------------------------------------------------------------------
# alpha2weight: oracle reimplements the sequential per-ray scan semantics of
# alpha2weight_cuda (render_utils_kernel.cu:576-605)
# ---------------------------------------------------------------------------

def _alpha2weight_oracle(alpha, valid):
    N, K = alpha.shape
    weights = np.zeros((N, K))
    alphainv_last = np.ones(N)
    for r in range(N):
        t_cum = 1.0
        for k in range(K):
            if not valid[r, k]:
                continue  # dropped from the ragged list
            weights[r, k] = t_cum * alpha[r, k]
            t_cum *= 1.0 - alpha[r, k]
            if t_cum < 1e-3:
                break
        alphainv_last[r] = t_cum
    return weights, alphainv_last


def test_alpha2weight_matches_sequential_oracle():
    rng = np.random.default_rng(3)
    alpha = rng.uniform(0, 0.5, size=(16, 24))
    valid = rng.uniform(size=(16, 24)) > 0.3
    w, ail, _ = render.alpha2weight(jnp.asarray(alpha), jnp.asarray(valid))
    ref_w, ref_ail = _alpha2weight_oracle(alpha, valid)
    assert np.allclose(np.asarray(w), ref_w, atol=1e-6)
    assert np.allclose(np.asarray(ail), ref_ail, atol=1e-6)


def test_alpha2weight_early_termination():
    # opaque first sample: later samples contribute nothing and alphainv_last
    # freezes at the break-point transmittance
    alpha = jnp.array([[0.9995, 0.5, 0.5]])
    w, ail, _ = render.alpha2weight(alpha)
    ref_w, ref_ail = _alpha2weight_oracle(np.asarray(alpha), np.ones((1, 3), bool))
    assert np.allclose(np.asarray(w), ref_w, atol=1e-7)
    assert np.allclose(np.asarray(ail), ref_ail, atol=1e-7)
    assert np.asarray(w)[0, 1] == 0.0  # terminated


def test_alpha2weight_all_invalid_ray():
    alpha = jnp.array([[0.5, 0.5]])
    valid = jnp.zeros((1, 2), dtype=bool)
    w, ail, _ = render.alpha2weight(alpha, valid)
    assert np.allclose(np.asarray(w), 0.0)
    assert np.allclose(np.asarray(ail), 1.0)


def test_alpha2weight_weights_sum_plus_last_is_one():
    rng = np.random.default_rng(4)
    alpha = jnp.asarray(rng.uniform(0, 0.3, size=(8, 50)))
    w, ail, _ = render.alpha2weight(alpha)
    total = np.asarray(jnp.sum(w, -1) + ail)
    assert np.allclose(total, 1.0, atol=1e-5)


def test_alpha2weight_gradients_finite():
    rng = np.random.default_rng(5)
    alpha = jnp.asarray(rng.uniform(0.01, 0.4, size=(4, 10)))

    def f(a):
        w, ail, _ = render.alpha2weight(a)
        return jnp.sum(w**2) + jnp.sum(ail)

    g = jax.grad(f)(alpha)
    assert np.isfinite(np.asarray(g)).all()
    # finite-difference check on one coordinate
    eps = 1e-4
    a0 = np.asarray(alpha)
    ap = a0.copy(); ap[1, 3] += eps
    am = a0.copy(); am[1, 3] -= eps
    fd = (float(f(jnp.asarray(ap))) - float(f(jnp.asarray(am)))) / (2 * eps)
    assert np.allclose(np.asarray(g)[1, 3], fd, rtol=1e-2, atol=1e-4)


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------

def test_ray_aabb_hand_computed():
    rays_o = jnp.array([[-2.0, 0.5, 0.5]])
    rays_d = jnp.array([[1.0, 0.0, 0.0]])
    t_min, t_max = render.ray_aabb(
        rays_o, rays_d, jnp.zeros(3), jnp.ones(3), near=0.1, far=100.0
    )
    assert np.allclose(np.asarray(t_min), 2.0, atol=1e-5)
    assert np.allclose(np.asarray(t_max), 3.0, atol=1e-5)


def test_sample_ndc_pts():
    rays_o = jnp.array([[0.0, 0.0, -1.0]])
    rays_d = jnp.array([[0.0, 0.0, 2.0]])
    pts = render.sample_ndc_pts_on_rays(rays_o, rays_d, 5)
    assert pts.shape == (1, 5, 3)
    assert np.allclose(np.asarray(pts)[0, :, 2], [-1.0, -0.5, 0.0, 0.5, 1.0])


def test_sample_pts_fixed_counts_and_bbox():
    rays_o = jnp.array([[-2.0, 0.5, 0.5], [5.0, 5.0, 5.0]])
    rays_d = jnp.array([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])  # second ray misses
    pts, valid, t_min = render.sample_pts_on_rays_fixed(
        rays_o, rays_d, jnp.zeros(3), jnp.ones(3), near=0.1, far=100.0,
        stepdist=0.25, n_samples=10,
    )
    v = np.asarray(valid)
    p = np.asarray(pts)
    # first ray: chord length 1.0, step 0.25 -> ceil(1/0.25)=4 samples, all in bbox
    assert v[0].sum() == 4
    assert np.allclose(p[0, 0], [0.0, 0.5, 0.5], atol=1e-5)
    # second ray: never inside the bbox
    assert v[1].sum() == 0


# ---------------------------------------------------------------------------
# distortion loss: dense O(K) vs naive O(K^2) pairwise oracle
# ---------------------------------------------------------------------------

def _distortion_oracle(w, s, interval):
    N, K = w.shape
    total = 0.0
    for r in range(N):
        for i in range(K):
            for j in range(K):
                total += w[r, i] * w[r, j] * abs(s[r, i] - s[r, j])
            total += (1.0 / 3.0) * interval * w[r, i] ** 2
    return total / N


def test_distortion_loss_matches_pairwise():
    rng = np.random.default_rng(6)
    w = rng.uniform(0, 0.2, size=(3, 12))
    w[0, 5:] = 0.0  # masked tail
    s = np.sort(rng.uniform(0, 1, size=(3, 12)), axis=-1)
    interval = 1.0 / 12
    ours = float(render.distortion_loss(jnp.asarray(w), jnp.asarray(s), interval))
    ref = _distortion_oracle(w, s, interval)
    assert np.allclose(ours, ref, rtol=1e-5)


# ---------------------------------------------------------------------------
# total variation gradient vs autodiff of the explicit clamped-TV loss
# ---------------------------------------------------------------------------

def test_tv_grad_matches_autodiff_small_values():
    rng = np.random.default_rng(7)
    grid = jnp.asarray(rng.uniform(-0.4, 0.4, size=(4, 5, 6, 2)).astype(np.float32))
    wx, wy, wz = 0.3, 0.5, 0.7

    # for |diffs| < 1 the clamp is inactive and the kernel's grad equals the
    # gradient of L = sum_axis w_axis/6 * 0.5 * sum_pairs (a-b)^2
    def tv_loss(g):
        lz = jnp.sum((g[:, :, 1:] - g[:, :, :-1]) ** 2) * (wx / 6.0) * 0.5
        ly = jnp.sum((g[:, 1:] - g[:, :-1]) ** 2) * (wy / 6.0) * 0.5
        lx = jnp.sum((g[1:] - g[:-1]) ** 2) * (wz / 6.0) * 0.5
        return lx + ly + lz

    ref = jax.grad(tv_loss)(grid)
    ours = render.total_variation_grad(grid, wx, wy, wz)
    assert np.allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


def test_tv_grad_clamps_large_diffs():
    grid = jnp.zeros((3, 1, 1, 1)).at[1, 0, 0, 0].set(10.0)
    ours = np.asarray(render.total_variation_grad(grid, 6.0, 6.0, 6.0))
    # center voxel: two neighbors, both diffs clamped to 1 -> grad = wz/6*2 = 2
    assert np.allclose(ours[1, 0, 0, 0], 2.0)
    assert np.allclose(ours[0, 0, 0, 0], -1.0)


def test_tv_grad_sparse_mode():
    rng = np.random.default_rng(8)
    grid = jnp.asarray(rng.normal(size=(4, 4, 4, 1)).astype(np.float32))
    sparse = jnp.zeros_like(grid).at[0, 0, 0, 0].set(1.0)
    out = np.asarray(render.total_variation_grad(grid, 1.0, 1.0, 1.0, sparse_grad=sparse))
    assert out[1, 0, 0, 0] == 0.0  # zero-grad voxel skipped
    assert out[0, 0, 0, 0] != 0.0

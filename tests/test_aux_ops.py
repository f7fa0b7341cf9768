"""Tests for the StyleGAN-heritage op equivalents, VQ grid, DirectQVGO, and
aux utilities (stats, misc)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fourk_nerf_tpu.ops import stylegan, vq
from fourk_nerf_tpu.utils import misc, stats


# ---------------------------------------------------------------------------
# bias_act / upfirdn2d / filtered_lrelu
# ---------------------------------------------------------------------------

def test_bias_act_lrelu_gain_clamp():
    x = jnp.array([[-2.0, 0.5]]).reshape(1, 2, 1, 1)
    b = jnp.array([1.0, -1.0])
    out = stylegan.bias_act(x, b, act="lrelu", gain=1.0, clamp=0.4)
    # x+b = [-1, -0.5]; lrelu(0.2) = [-0.2, -0.1]; clamp 0.4 no-op
    assert np.allclose(np.asarray(out).ravel(), [-0.2, -0.1], atol=1e-6)
    out2 = stylegan.bias_act(x, b, act="linear", gain=2.0, clamp=1.5)
    assert np.allclose(np.asarray(out2).ravel(), [-1.5, -1.0], atol=1e-6)


def test_upfirdn2d_identity_and_box_downsample():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 2, 8, 8)).astype(np.float32))
    ident = stylegan.upfirdn2d(x, jnp.ones((1, 1)), up=1, down=1)
    assert np.allclose(np.asarray(ident), np.asarray(x), atol=1e-6)
    # 2x2 box filter + down 2 == average pooling
    f = stylegan.setup_filter([1, 1])
    down = stylegan.downsample2d(x, f, down=2)
    ref = np.asarray(x).reshape(1, 2, 4, 2, 4, 2).mean((3, 5))
    assert down.shape == (1, 2, 4, 4)
    assert np.allclose(np.asarray(down), ref, atol=1e-5)


def test_upfirdn2d_upsample_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.default_rng(1).normal(size=(1, 1, 5, 5)).astype(np.float32)
    f = np.asarray(stylegan.setup_filter([1, 3, 3, 1]))
    up = stylegan.upsample2d(jnp.asarray(x), jnp.asarray(f), up=2)  # internal gain=up^2
    assert up.shape == (1, 1, 10, 10)
    # oracle: zero-stuff then conv2d with flipped filter (true convolution)
    xt = torch.zeros(1, 1, 10, 10)
    xt[0, 0, ::2, ::2] = torch.from_numpy(x[0, 0])
    fh = f.shape[0]
    pad = ((fh + 1) // 2, (fh - 2) // 2)
    xp = torch.nn.functional.pad(xt, (pad[0], pad[1], pad[0], pad[1]))
    k = torch.from_numpy(np.ascontiguousarray(f[::-1, ::-1].copy()))[None, None] * 4.0
    ref = torch.nn.functional.conv2d(xp, k)
    assert np.allclose(np.asarray(up), ref.numpy(), atol=1e-4)


def test_filtered_lrelu_runs():
    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 3, 6, 6)).astype(np.float32))
    f = stylegan.setup_filter([1, 3, 3, 1])
    out = stylegan.filtered_lrelu(x, f, f, b=jnp.zeros(3), up=2, down=2, padding=2)
    assert out.shape[0] == 1 and out.shape[1] == 3
    assert np.isfinite(np.asarray(out)).all()


def test_hash_encode_shapes_and_grads():
    key = jax.random.PRNGKey(0)
    table = stylegan.init_hash_table(key, n_levels=4, log2_table_size=8)
    xyz = jnp.asarray(np.random.default_rng(3).uniform(size=(10, 3)).astype(np.float32))
    out = stylegan.hash_encode(xyz, table, n_levels=4)
    assert out.shape == (10, 8)
    g = jax.grad(lambda t: jnp.sum(stylegan.hash_encode(xyz, t, n_levels=4) ** 2))(table)
    assert float(jnp.abs(g).sum()) > 0


def test_topp_masking():
    w = jnp.array([[0.5, 0.3, 0.15, 0.05]])
    keep = np.asarray(stylegan.topp_masking(w, p=0.8))
    # sorted cumsum-exclusive: 0, .5, .8, .95 -> keep while < .8 -> first two
    assert keep.tolist() == [[True, True, False, False]]


# ---------------------------------------------------------------------------
# VQ codebook
# ---------------------------------------------------------------------------

def test_vq_quantize_and_ema_update():
    params, state = vq.init_vq(jax.random.PRNGKey(0), input_dim=6, dim=4, n_embed=16)
    x = jnp.asarray(np.random.default_rng(4).normal(size=(32, 6)).astype(np.float32))
    q, diff, idx, new_state = vq.vq_forward(params, state, x, training=True)
    assert q.shape == (32, 4)
    assert idx.shape == (32,)
    assert float(diff) >= 0
    assert not np.allclose(np.asarray(new_state["cluster_size"]), 0.0)
    # eval mode leaves state untouched
    _, _, _, same_state = vq.vq_forward(params, state, x, training=False)
    assert same_state is state
    # straight-through: grads flow to the projection
    g = jax.grad(lambda p: jnp.sum(vq.vq_forward(p, state, x)[0] ** 2))(params)
    assert float(jnp.abs(g["project"]["w0"]).sum()) > 0


def test_dvqgo_forward():
    from fourk_nerf_tpu.models import dvqgo

    cfg = dvqgo.make_config(
        xyz_min=[-1, -1, 0], xyz_max=[1, 1, 1], num_voxels=16 * 16 * 8, mpi_depth=8,
        rgbnet_dim=4, rgbnet_width=16, spatial_pe=2, viewbase_pe=2,
        fast_color_thres=0.0, n_cluster=64,
    )
    params, buffers = dvqgo.init(cfg, jax.random.PRNGKey(0))
    assert "k0" not in params and "k0_vq" in params
    rng = np.random.default_rng(5)
    ro = jnp.asarray(np.concatenate([rng.uniform(-0.5, 0.5, (4, 2)), np.zeros((4, 1))], -1), dtype=jnp.float32)
    rd = jnp.asarray(np.concatenate([rng.uniform(-0.1, 0.1, (4, 2)), np.ones((4, 1))], -1), dtype=jnp.float32)
    vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    out = dvqgo.forward(cfg, params, buffers, ro, rd, vd, stepsize=1.0, bg=0.0, is_train=True)
    assert out["rgb_marched"].shape == (4, 3)
    assert "vq_state" in out and "vq_diff" in out
    assert np.isfinite(np.asarray(out["rgb_marched"])).all()


# ---------------------------------------------------------------------------
# stats / misc
# ---------------------------------------------------------------------------

def test_stats_collector_moments():
    c = stats.Collector()
    x = jnp.asarray([1.0, 2.0, 3.0])
    c.report("loss", stats.moments(x))
    c.report("loss", stats.moments(jnp.asarray([4.0])))
    s = c.as_dict()["loss"]
    assert s.num == 4
    assert np.isclose(s.mean, 2.5)
    assert np.isclose(s.std, np.std([1, 2, 3, 4]))


def test_misc_assert_shape_and_sampler():
    misc.assert_shape(jnp.zeros((2, 3)), (2, None))
    with pytest.raises(AssertionError):
        misc.assert_shape(jnp.zeros((2, 3)), (3, None))
    it = misc.infinite_sampler(5, np.random.default_rng(0), rank=1, num_replicas=2)
    vals = [next(it) for _ in range(4)]
    assert all(0 <= v < 5 for v in vals)

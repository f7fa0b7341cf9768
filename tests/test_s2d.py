"""Space-to-depth SR decode reformulation: exactness of the kernel
transforms and bf16-level parity of the full fast path (ops/s2d.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourk_nerf_tpu.models import sr_esrnet
from fourk_nerf_tpu.ops import s2d


def _conv(a, k):
    return jax.lax.conv_general_dilated(
        a, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.smoke
def test_s2d_kernel_transform_exact():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 12, 16, 3)).astype(np.float32))
    K = jnp.asarray(rng.normal(size=(3, 3, 3, 5)).astype(np.float32))
    ref = _conv(x, K)
    got = s2d.d2s(_conv(s2d.s2d(x), s2d.s2d_kernel(K)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.smoke
def test_up_phase_conv_exact():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 11, 9, 4)).astype(np.float32))
    K = jnp.asarray(rng.normal(size=(3, 3, 4, 6)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(6,)).astype(np.float32))
    up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    ref = _conv(up, K) + b
    got = s2d.conv_up_phase(x, K, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_up_dilated_conv_exact():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 11, 9, 4)).astype(np.float32))
    K = jnp.asarray(rng.normal(size=(3, 3, 4, 6)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(6,)).astype(np.float32))
    up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    ref = _conv(up, K) + b
    got = s2d.conv_up_dilated(x, K, b)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("H,W", [(32, 48), (29, 41)])
def test_full_net_matches_reference(H, W):
    """Even and odd frame dims (odd exercises the phase masking)."""
    rng = np.random.default_rng(2)
    model = sr_esrnet.SFTNet(n_in_colors=3, scale=4, num_feat=64, num_block=1,
                             num_grow_ch=32, num_cond=1)
    x = jnp.asarray(rng.normal(size=(1, H, W, 3)).astype(np.float32))
    cond = jnp.asarray(rng.normal(size=(1, H, W, 1)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x, cond)["params"]
    ref = model.apply({"params": params}, x, cond)
    got = s2d.sftnet_apply_s2d(params, x, cond, scale=4, num_block=1)
    assert got.shape == ref.shape
    assert float(jnp.max(jnp.abs(got - ref))) < 0.06

"""Pallas fused SFTNet dense-block kernel vs the XLA body (interpret mode).

The fused kernel must be exact to bf16 rounding for ANY tile split,
including frames that don't divide the tile size (frame-edge masking
restores per-layer zero-pad semantics -- see ops/pallas_sr.py docstring).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourk_nerf_tpu.models import sr_esrnet
from fourk_nerf_tpu.ops import pallas_sr


def _mk(num_block=1, H=29, W=41, seed=0):
    rng = np.random.default_rng(seed)
    model = sr_esrnet.SFTNet(n_in_colors=3, scale=4, num_feat=64,
                             num_block=num_block, num_grow_ch=32, num_cond=1)
    x = jnp.asarray(rng.normal(size=(1, H, W, 3)).astype(np.float32))
    cond = jnp.asarray(rng.normal(size=(1, H, W, 1)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x, cond)["params"]
    return model, params, x, cond


def test_rdb_kernel_matches_module():
    """Single dense block, uneven frame/tile split."""
    rng = np.random.default_rng(1)
    H, W, th, tw = 21, 30, 12, 16
    blk = sr_esrnet.ResidualDenseBlockSFT(64, 32)
    x = jnp.asarray(rng.normal(size=(1, H, W, 64)).astype(np.float32))
    cond = jnp.asarray(rng.normal(size=(1, H, W, 32)).astype(np.float32))
    params = blk.init(jax.random.PRNGKey(0), x, cond)["params"]
    ref = blk.apply({"params": params}, x.astype(jnp.bfloat16),
                    cond.astype(jnp.bfloat16))[0]

    ny, nx = -(-H // th), -(-W // tw)
    Hq, Wq = ny * th, nx * tw
    body = jnp.pad(x[0].astype(jnp.bfloat16), ((0, Hq - H), (0, Wq - W), (0, 0)))
    condp = jnp.pad(cond[0].astype(jnp.bfloat16),
                    ((pallas_sr._HALO, pallas_sr._HALO + Hq - H),
                     (pallas_sr._HALO, pallas_sr._HALO + Wq - W),
                     (0, 128 - 32)))
    got = pallas_sr.rdb_apply_pallas(
        body, condp, pallas_sr.pack_rdb_weights(params),
        H=H, W=W, th=th, tw=tw, interpret=True)[:H, :W]
    assert float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                 - ref.astype(jnp.float32)))) < 0.05


@pytest.mark.parametrize("H,W,th,tw", [(32, 48, 16, 24), (29, 41, 16, 24)])
def test_full_net_matches_xla(H, W, th, tw):
    model, params, x, cond = _mk(num_block=1, H=H, W=W)
    ref16 = sr_esrnet.apply_bf16(model, params, x, cond)
    got = pallas_sr.sftnet_apply_pallas(params, x, cond, scale=4, num_block=1,
                                        th=th, tw=tw, interpret=True)
    assert got.shape == ref16.shape
    assert float(jnp.max(jnp.abs(got - ref16))) < 0.05

    ref = model.apply({"params": params}, x, cond)  # f32 reference
    assert float(jnp.max(jnp.abs(got - ref))) < 0.08

"""Pallas fused SFTNet dense-block kernel vs the XLA body (interpret mode).

The fused kernel must be exact to bf16 rounding for ANY frame size
(clamped halo windows + frame-edge masking restore per-layer zero-pad
semantics -- see ops/pallas_sr.py docstring).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourk_nerf_tpu.models import sr_esrnet
from fourk_nerf_tpu.ops import pallas_sr


def test_rdb_kernel_matches_module():
    """Single dense block, frame not dividing the tile grid."""
    rng = np.random.default_rng(1)
    H, W, th, tw = 37, 55, 16, 32  # Hq=48 >= wh=32, Wq=64 >= ww=48
    blk = sr_esrnet.ResidualDenseBlockSFT(64, 32)
    x = jnp.asarray(rng.normal(size=(1, H, W, 64)).astype(np.float32))
    cond = jnp.asarray(rng.normal(size=(1, H, W, 32)).astype(np.float32))
    params = blk.init(jax.random.PRNGKey(0), x, cond)["params"]
    ref = blk.apply({"params": params}, x.astype(jnp.bfloat16),
                    cond.astype(jnp.bfloat16))[0]

    ny, nx = -(-H // th), -(-W // tw)
    Hq, Wq = ny * th, nx * tw
    packed_bc = jnp.concatenate(
        [x[0], cond[0], jnp.zeros((H, W, 32))], -1).astype(jnp.bfloat16)
    body = jnp.pad(packed_bc, ((0, Hq - H), (0, Wq - W), (0, 0)))
    got = pallas_sr.rdb_apply_pallas(
        body, pallas_sr.pack_rdb_weights(params),
        H=H, W=W, th=th, tw=tw, interpret=True)[:H, :W, :64]
    assert float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                 - ref.astype(jnp.float32)))) < 0.05


@pytest.mark.slow
def test_rrdb_tail_fusion_matches_module():
    """rdb3 call with the RRDB trailing SFT + residual fused in."""
    rng = np.random.default_rng(3)
    H, W, th, tw = 32, 64, 16, 32
    rrdb = sr_esrnet.RRDBSFT(64, 32)
    x = jnp.asarray(rng.normal(size=(1, H, W, 64)).astype(np.float32))
    cond = jnp.asarray(rng.normal(size=(1, H, W, 32)).astype(np.float32))
    params = rrdb.init(jax.random.PRNGKey(0), x, cond)["params"]
    ref = rrdb.apply({"params": params}, x.astype(jnp.bfloat16),
                     cond.astype(jnp.bfloat16))[0]

    body = jnp.concatenate(
        [x[0], cond[0], jnp.zeros((H, W, 32))], -1).astype(jnp.bfloat16)
    cur = body
    for j in (1, 2):
        cur = pallas_sr.rdb_apply_pallas(
            cur, pallas_sr.pack_rdb_weights(params[f"rdb{j}"]),
            H=H, W=W, th=th, tw=tw, interpret=True)
    got = pallas_sr.rdb_apply_pallas(
        cur,
        pallas_sr.pack_rdb_weights(params["rdb3"], rrdb_sft=params["sft0"]),
        H=H, W=W, th=th, tw=tw, xin=body, interpret=True)[:H, :W, :64]
    # three chained bf16 blocks + SFT: ~0.8% of the +-6.5 output range
    assert float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                 - ref.astype(jnp.float32)))) < 0.08


@pytest.mark.slow
def test_full_net_matches_xla():
    H, W, th, tw = 45, 70, 16, 32
    rng = np.random.default_rng(0)
    model = sr_esrnet.SFTNet(n_in_colors=3, scale=4, num_feat=64, num_block=1,
                             num_grow_ch=32, num_cond=1)
    x = jnp.asarray(rng.normal(size=(1, H, W, 3)).astype(np.float32))
    cond = jnp.asarray(rng.normal(size=(1, H, W, 1)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x, cond)["params"]
    ref16 = sr_esrnet.apply_bf16(model, params, x, cond)
    got = pallas_sr.sftnet_apply_pallas(params, x, cond, scale=4, num_block=1,
                                        th=th, tw=tw, interpret=True)
    assert got.shape == ref16.shape
    assert float(jnp.max(jnp.abs(got - ref16))) < 0.05

    ref = model.apply({"params": params}, x, cond)  # f32 reference
    assert float(jnp.max(jnp.abs(got - ref))) < 0.08

    # dilated upchain variant (exact weight-space rewrite of up2+conv)
    got_d = pallas_sr.sftnet_apply_pallas(params, x, cond, scale=4,
                                          num_block=1, th=th, tw=tw,
                                          interpret=True, upchain="dilated")
    assert float(jnp.max(jnp.abs(got_d - ref16))) < 0.05

    # whole-RRDB fused kernel (halo recompute, f32 inter-block residuals)
    got_f = pallas_sr.sftnet_apply_pallas(params, x, cond, scale=4,
                                          num_block=1, th=th, tw=tw,
                                          interpret=True, fuse_rrdb=True)
    assert float(jnp.max(jnp.abs(got_f - ref16))) < 0.05
    assert float(jnp.max(jnp.abs(got_f - ref))) < 0.08


@pytest.mark.slow
def test_fused_rrdb_chains_blocks():
    """Two RRDBs through the fused kernel: the cond channels must survive
    the block-to-block handoff (they ride lanes 64:96 of the body tensor
    and every fused program copies them through)."""
    H, W, th, tw = 33, 50, 16, 32
    rng = np.random.default_rng(4)
    model = sr_esrnet.SFTNet(n_in_colors=3, scale=2, num_feat=64, num_block=2,
                             num_grow_ch=32, num_cond=1)
    x = jnp.asarray(rng.normal(size=(1, H, W, 3)).astype(np.float32))
    cond = jnp.asarray(rng.normal(size=(1, H, W, 1)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(3), x, cond)["params"]
    ref16 = sr_esrnet.apply_bf16(model, params, x, cond)
    got = pallas_sr.sftnet_apply_pallas(params, x, cond, scale=2, num_block=2,
                                        th=th, tw=tw, interpret=True,
                                        fuse_rrdb=True)
    assert got.shape == ref16.shape
    assert float(jnp.max(jnp.abs(got - ref16))) < 0.05


def test_uptail_fusion_matches_xla():
    """Fused conv_up2+conv_hr+conv_last (phase domain) vs the XLA chain,
    odd frame dims + clamped edge tiles."""
    rng = np.random.default_rng(7)
    H2, W2 = 45, 70
    model = sr_esrnet.SFTNet(n_in_colors=3, scale=4)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)),
                       jnp.zeros((1, 16, 16, 1)))["params"]
    x = jnp.asarray(rng.normal(size=(1, H2, W2, 64)).astype(np.float32))

    def up2(a):
        return jnp.repeat(jnp.repeat(a, 2, axis=1), 2, axis=2)

    bf = jnp.bfloat16
    b = pallas_sr._lrelu(pallas_sr._conv(params["conv_up2"], up2(x.astype(bf))))
    out = pallas_sr._lrelu(pallas_sr._conv(params["conv_hr"], b))
    k = jnp.asarray(params["conv_last"]["kernel"], bf)
    ref = jax.lax.conv_general_dilated(
        out, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) \
        + jnp.asarray(params["conv_last"]["bias"], jnp.float32)
    got = pallas_sr.uptail_apply_pallas(
        x, pallas_sr.pack_uptail_weights(params), th=16, tw=32,
        interpret=True)
    assert got.shape == (1, 2 * H2, 2 * W2, 3)
    assert float(jnp.max(jnp.abs(got - ref.astype(jnp.float32)))) < 0.03

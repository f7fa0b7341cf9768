"""Bounded-scene differentiable slab-sweep training render == the
chunked-gather training forward (models/dvgo.py), values AND gradients.

``sweep_rays_train_box`` renders a coherent pixel patch through the slab
sweep and emits the dense per-sample tensors the encoder losses consume
(slab-major K' = (Z-1)*S layout; each global sample index k occupies
exactly one slot, weight 0 elsewhere).  These tests verify, against
``dvgo.forward`` on the same rays:

  * composited outputs (rgb_marched, alphainv_last) match,
  * the per-sample weights match sample-for-sample after scattering the
    slab-major layout back onto the global k axis,
  * the full encoder LOSS matches,
  * d(loss)/d(density), d(loss)/d(k0) and d(loss)/d(rgbnet) match --
    the training-parity guarantee for the TPU-native bounded train path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourk_nerf_tpu.config import ConfigDict
from fourk_nerf_tpu.models import dvgo
from fourk_nerf_tpu.ops import box_sweep, rays as ray_ops
from fourk_nerf_tpu.train import losses


def _scene():
    rng = np.random.default_rng(7)
    cfg = dvgo.make_config(
        xyz_min=[-1.2, -1.2, -1.2], xyz_max=[1.2, 1.2, 1.2],
        num_voxels=40 ** 3, num_voxels_base=40 ** 3, alpha_init=1e-3,
        rgbnet_dim=6, rgbnet_width=16, rgbnet_depth=3, fast_color_thres=1e-4)
    params, buffers = dvgo.init(cfg, jax.random.PRNGKey(0))
    X, Y, Z = cfg.world_size
    gx, gy, gz = np.meshgrid(*[np.linspace(-1, 1, s) for s in (X, Y, Z)],
                             indexing="ij")
    blob = gx ** 2 + gy ** 2 + gz ** 2 < 0.5
    params["density"] = jnp.asarray(
        np.where(blob, rng.normal(3, 2, blob.shape), -4.0)[..., None]
        .astype(np.float32))
    params["k0"] = jnp.asarray(
        rng.normal(0, 1, params["k0"].shape).astype(np.float32))
    buffers = dict(buffers)
    buffers["mask_cache"] = jnp.asarray(
        blob | (rng.uniform(size=blob.shape) < 0.1))

    H = W = 40
    f = 0.9 * W
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    ang = 0.35
    Ry = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                   [-np.sin(ang), 0, np.cos(ang)]], np.float32)
    c2w = np.eye(4, dtype=np.float32)[:3, :4]
    c2w[:3, :3] = Ry
    c2w[:3, 3] = Ry @ np.array([0, 0, 3.2], np.float32)
    ro, rd, vd = ray_ops.get_rays_of_a_view(
        H, W, K, c2w, ndc=False, inverse_y=False, flip_x=False, flip_y=False)
    r0, c0, P = 14, 11, 8  # off-center 8x8 patch
    sl = (slice(r0, r0 + P), slice(c0, c0 + P))
    flat = lambda x: jnp.asarray(np.asarray(x)[sl].reshape(-1, 3))
    return cfg, params, buffers, flat(ro), flat(rd), flat(vd)


KW = dict(stepsize=0.5, near=0.2, bg=1.0)


def _both(cfg, params, buffers, ro, rd, vd):
    plan = box_sweep.box_train_plan(cfg, ro, rd, stepsize=KW["stepsize"],
                                    near=KW["near"])
    assert plan is not None, "patch must have a dominant axis"
    axis, flip, S = plan
    pupv = box_sweep.box_window_size_for(
        cfg, ro, rd, vd, stepsize=KW["stepsize"], near=KW["near"],
        axis=axis, flip=flip)
    assert pupv is not None
    Pu, Pv = pupv

    ref = dvgo.forward(cfg, params, buffers, ro, rd, vd,
                       stepsize=KW["stepsize"], near=KW["near"], far=1e9,
                       bg=KW["bg"], is_train=True)
    got = box_sweep.sweep_rays_train_box(
        cfg, params, buffers, ro, rd, vd, stepsize=KW["stepsize"],
        near=KW["near"], bg=KW["bg"], axis=axis, flip=flip, S=S,
        Pu=Pu, Pv=Pv, use_bf16=False)
    return ref, got


def test_outputs_and_weights_match():
    cfg, params, buffers, ro, rd, vd = _scene()
    ref, got = _both(cfg, params, buffers, ro, rd, vd)
    np.testing.assert_allclose(np.asarray(got["rgb_marched"]),
                               np.asarray(ref["rgb_marched"]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got["alphainv_last"]),
                               np.asarray(ref["alphainv_last"]), atol=2e-5)

    # scatter the slab-major slots back onto the global k axis and compare
    # weights sample-for-sample
    n_ref = ref["n_max"]
    R, Kd = got["weights"].shape
    Kref = ref["weights"].shape[1]
    k_idx = np.rint(np.asarray(got["s"]) * n_ref - 0.5).astype(np.int64)
    w_got = np.asarray(got["weights"])
    rgb_got = np.asarray(got["raw_rgb"])
    dense_w = np.zeros((R, Kref))
    dense_rgb = np.zeros((R, Kref, 3))
    for r in range(R):
        for q in range(Kd):
            if w_got[r, q] > 0:
                k = k_idx[r, q]
                assert 0 <= k < Kref
                assert dense_w[r, k] == 0, "sample slot double-assigned"
                dense_w[r, k] = w_got[r, q]
                dense_rgb[r, k] = rgb_got[r, q]
    w_ref = np.asarray(ref["weights"])
    np.testing.assert_allclose(dense_w, w_ref, atol=2e-5)
    m = w_ref > 1e-4
    np.testing.assert_allclose(dense_rgb[m], np.asarray(ref["raw_rgb"])[m],
                               atol=2e-5)


def test_loss_and_gradients_match():
    cfg, params, buffers, ro, rd, vd = _scene()
    plan = box_sweep.box_train_plan(cfg, ro, rd, stepsize=KW["stepsize"],
                                    near=KW["near"])
    axis, flip, S = plan
    Pu, Pv = box_sweep.box_window_size_for(
        cfg, ro, rd, vd, stepsize=KW["stepsize"], near=KW["near"],
        axis=axis, flip=flip)
    cfg_train = ConfigDict(dict(
        weight_main=1.0, weight_entropy_last=1e-3, weight_distortion=0.01,
        weight_rgbper=0.01, weight_nearclip=0.0))
    rng = np.random.default_rng(9)
    target = jnp.asarray(rng.uniform(0, 1, (ro.shape[0], 3)).astype(np.float32))

    def loss_ref(p):
        out = dvgo.forward(cfg, p, buffers, ro, rd, vd,
                           stepsize=KW["stepsize"], near=KW["near"], far=1e9,
                           bg=KW["bg"], is_train=True)
        return losses.encoder_losses(out, target, cfg_train, ro.shape[0])[0]

    def loss_box(p):
        out = box_sweep.sweep_rays_train_box(
            cfg, p, buffers, ro, rd, vd, stepsize=KW["stepsize"],
            near=KW["near"], bg=KW["bg"], axis=axis, flip=flip, S=S,
            Pu=Pu, Pv=Pv, use_bf16=False)
        return losses.encoder_losses(out, target, cfg_train, ro.shape[0])[0]

    l_ref, g_ref = jax.value_and_grad(loss_ref)(params)
    l_box, g_box = jax.value_and_grad(loss_box)(params)
    np.testing.assert_allclose(float(l_box), float(l_ref), rtol=1e-5)
    for name in ("density", "k0"):
        a, b = np.asarray(g_ref[name]), np.asarray(g_box[name])
        np.testing.assert_allclose(b, a, atol=5e-5, err_msg=name)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(b), np.asarray(a), atol=5e-5), g_ref["rgbnet"],
        g_box["rgbnet"])


def test_patch_box_sampler_is_step_indexed():
    """Resume stability: the patch_box sampler is a pure function of
    (seed, step) like every other sampler (trainer.make_batch_sampler)."""
    from fourk_nerf_tpu.train.trainer import make_batch_sampler
    flat = {"rgb": np.zeros((3, 40, 40, 3), np.float32)}
    s1 = make_batch_sampler("patch_box", flat, n_rand=256, seed=5)
    s2 = make_batch_sampler("patch_box", flat, n_rand=256, seed=5)
    seq1 = [s1(i) for i in range(40)]
    # replay out of order on a fresh sampler
    seq2 = [s2(i) for i in reversed(range(40))][::-1]
    assert seq1 == seq2
    assert s1.patch == 16  # largest multiple of 8 with P^2 <= 256
    kinds, sels = zip(*seq1)
    assert set(kinds) == {"patch"}
    # every (view, origin) combo visited once per epoch
    n_combo = 3 * len({min(r, 40 - 16) for r in range(0, 40, 16)}) ** 2
    assert len(set(sels[:n_combo])) == n_combo


def test_native_mask_mode_matches_gather():
    """Mask at a DIFFERENT resolution than the grid exercises the
    native-mask branch of the train sweep (per-slab mask plane stack,
    snapped one-hot lookups in mask index space)."""
    cfg, params, buffers, ro, rd, vd = _scene()
    rng = np.random.default_rng(11)
    m = rng.uniform(size=(25, 27, 23)) < 0.6  # != world_size
    buffers = dict(buffers)
    buffers["mask_cache"] = jnp.asarray(m)
    ref, got = _both(cfg, params, buffers, ro, rd, vd)
    np.testing.assert_allclose(np.asarray(got["rgb_marched"]),
                               np.asarray(ref["rgb_marched"]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got["alphainv_last"]),
                               np.asarray(ref["alphainv_last"]), atol=2e-5)

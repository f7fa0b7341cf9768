"""Deterministic LPIPS proxy + LPIPS-gated best-checkpoint mechanism.

The reference gates joint-SR best checkpoints strictly on val LPIPS
(/root/reference/run_sr.py:1150-1156). The torch ``lpips`` package does not
exist in zero-egress images, so ``metrics.rgb_lpips`` returns None and the
trainer falls back to ``metrics.rgb_lpips_proxy`` -- a fixed-seed
random-feature perceptual distance that keeps the gating *mechanism* live.
"""

import os
import types

import numpy as np
import pytest

from fourk_nerf_tpu.utils import metrics


def _img(seed=0, h=48, w=64):
    return np.asarray(
        np.random.default_rng(seed).uniform(0, 1, (h, w, 3)), np.float32)


def test_proxy_identity_and_determinism():
    x = _img(0)
    assert metrics.rgb_lpips_proxy(x, x) == 0.0
    y = _img(1)
    d1 = metrics.rgb_lpips_proxy(x, y)
    metrics._LPIPS_PROXY_FILTERS.clear()  # fresh filter cache -> same value
    d2 = metrics.rgb_lpips_proxy(x, y)
    assert d1 == d2 and d1 > 0


def test_proxy_monotone_under_noise():
    rng = np.random.default_rng(0)
    x = _img(0)
    noise = rng.normal(size=x.shape).astype(np.float32)
    prev = 0.0
    for sigma in (0.02, 0.05, 0.1, 0.2):
        d = metrics.rgb_lpips_proxy(x, np.clip(x + sigma * noise, 0, 1))
        assert d > prev
        prev = d


def test_proxy_detects_blur_and_prefers_true_image():
    # a structured image: blur must be detected, and the true image must
    # score better than a spatially-shuffled copy with identical statistics
    h, w = 48, 64
    yy, xx = np.mgrid[0:h, 0:w]
    x = np.stack([np.sin(xx / 3.0), np.cos(yy / 4.0), np.sin((xx + yy) / 5.0)],
                 -1).astype(np.float32) * 0.5 + 0.5
    blurred = x.copy()
    for ax in (0, 1):
        blurred = (np.roll(blurred, 1, ax) + blurred + np.roll(blurred, -1, ax)) / 3
    rng = np.random.default_rng(0)
    shuffled = x.reshape(-1, 3)[rng.permutation(h * w)].reshape(h, w, 3)
    d_blur = metrics.rgb_lpips_proxy(x, blurred)
    d_shuf = metrics.rgb_lpips_proxy(x, shuffled)
    assert 0 < d_blur < d_shuf


@pytest.mark.slow
def test_evaluate_sr_falls_back_to_proxy(monkeypatch, tmp_path):
    """When torch-lpips is absent, evaluate_sr reports a proxy lpips_sr and
    flags it; the trainer's first-val announcement names the proxy."""
    jax = pytest.importorskip("jax")
    from fourk_nerf_tpu.config import load_config
    from fourk_nerf_tpu.train import sr_trainer, trainer
    from test_train_smoke import _make_synthetic_scene

    monkeypatch.setattr(metrics, "rgb_lpips", lambda *a, **k: None)

    cfg_dir = os.path.join(os.path.dirname(__file__), "..", "fourk_nerf_tpu",
                           "configs")
    cfg = load_config(os.path.join(cfg_dir, "syn", "chair_joint_1x_l1_gan.py"))
    cfg.basedir = str(tmp_path)
    cfg.expname = "proxy_gate"
    cfg.data.load_sr = 1
    cfg.data.factor = 4
    cfg.fine_train.N_iters = 8
    cfg.fine_train.N_patch = 8
    cfg.fine_train.pg_scale = []
    cfg.fine_train.weight_pcp = 0
    cfg.fine_train.weight_gan = 0
    cfg.fine_model_and_render.num_voxels = 16**3
    cfg.fine_model_and_render.num_voxels_base = 16**3
    cfg.fine_model_and_render.rgbnet_dim = 6
    cfg.fine_model_and_render.rgbnet_width = 16
    cfg.fine_model_and_render.num_cond = 1
    cfg.fine_model_and_render.dim_rend = 3

    dd = _make_synthetic_scene(H=16, W=16, n_views=4)
    dd["srgt"] = np.repeat(np.repeat(dd["images"], 4, axis=1), 4, axis=2)
    dd["w2c"] = np.stack([np.eye(3, dtype=np.float32)] * len(dd["poses"]))

    # i_val=4 over 8 iters -> the gating block runs twice on the proxy
    args = types.SimpleNamespace(seed=0, no_reload=True, ftdv_path="",
                                 ftsr_path="", i_print=0, i_val=4,
                                 i_weights=0, test_tile=0)
    xyz_min, xyz_max = trainer.compute_bbox_by_cam_frustrm(
        cfg, dd["HW"], dd["Ks"], dd["poses"], dd["i_train"], dd["near"],
        dd["far"])
    (model_mod, model_cfg, params, buffers, sr_model, sr_params
     ) = sr_trainer.scene_rep_reconstruction_sr_patch(
        args, cfg, cfg.fine_model_and_render, cfg.fine_train,
        xyz_min, xyz_max, dd, stage="fine")

    # an LPIPS-gated best checkpoint was written
    assert os.path.exists(os.path.join(cfg.basedir, cfg.expname, "render_val",
                                       "best_joint.npz"))

    render_kwargs = {"near": dd["near"], "far": dd["far"], "bg": 1.0,
                     "stepsize": 0.5}
    val = sr_trainer.evaluate_sr(
        args, cfg, cfg.fine_model_and_render, model_mod, model_cfg, params,
        buffers, sr_model, sr_params, dd, render_kwargs, sr_ratio=4)
    assert val["lpips_sr_is_proxy"] is True
    assert np.isfinite(val["lpips_sr"]) and val["lpips_sr"] >= 0


def test_gate_tracks_lpips_not_psnr():
    """The improvement predicate is LPIPS-only whenever a gate value exists
    (reference run_sr.py:1150-1156): a PSNR gain with an LPIPS loss must NOT
    refresh the best checkpoint."""
    best_lpips, best_psnr = 0.10, 20.0
    val = {"lpips_sr": 0.15, "psnr_sr": 30.0}  # psnr up, lpips worse
    gate = val.get("lpips_sr")
    improved = (gate is not None and gate < best_lpips) or (
        gate is None and val["psnr_sr"] > best_psnr)
    assert not improved
    val = {"lpips_sr": 0.05, "psnr_sr": 10.0}  # lpips better, psnr down
    gate = val.get("lpips_sr")
    improved = (gate is not None and gate < best_lpips) or (
        gate is None and val["psnr_sr"] > best_psnr)
    assert improved

"""Joint encoder+SR training smoke test (run_sr.py pipeline, tiny shapes)."""

import os
import types

import numpy as np
import jax
import pytest

from fourk_nerf_tpu.config import load_config
from fourk_nerf_tpu.train import sr_trainer, trainer
from test_train_smoke import _make_synthetic_scene

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "fourk_nerf_tpu", "configs")


@pytest.fixture(scope="module")
def joint_cfg(tmp_path_factory):
    cfg = load_config(os.path.join(CFG_DIR, "syn", "chair_joint_1x_l1_gan.py"))
    cfg.basedir = str(tmp_path_factory.mktemp("logs"))
    cfg.expname = "joint_smoke"
    cfg.data.load_sr = 1
    cfg.data.factor = 4  # sr_ratio = 4
    cfg.fine_train.N_iters = 8
    cfg.fine_train.N_patch = 8
    cfg.fine_train.pg_scale = []
    cfg.fine_train.weight_pcp = 0  # no pretrained VGG in this image
    cfg.fine_train.weight_gan = 0.05
    cfg.fine_train.weight_distortion = 0.01
    cfg.fine_model_and_render.num_voxels = 16**3
    cfg.fine_model_and_render.num_voxels_base = 16**3
    cfg.fine_model_and_render.rgbnet_dim = 6
    cfg.fine_model_and_render.rgbnet_width = 16
    cfg.fine_model_and_render.num_cond = 1
    cfg.fine_model_and_render.dim_rend = 3
    return cfg


def _data_with_srgt():
    dd = _make_synthetic_scene(H=16, W=16, n_views=4)
    # fake 4x HR ground truth: nearest-upsampled LR images (NHWC)
    srgt = np.repeat(np.repeat(dd["images"], 4, axis=1), 4, axis=2)
    dd["srgt"] = srgt
    dd["w2c"] = np.stack([np.eye(3, dtype=np.float32)] * len(dd["poses"]))
    return dd


@pytest.mark.slow
def test_joint_step_published_objective(joint_cfg, tmp_path):
    """The FULL published objective (l1 + perceptual 0.5 + style 0.2 +
    gan 0.05, reference configs/llff/fern_lg_joint_l1+gan.py:17-19) trains
    with every loss term live, using the fixed-seed random VGG tower
    (fine_train.allow_random_vgg) in place of the unavailable pretrained
    weights."""
    import copy

    cfg = copy.deepcopy(joint_cfg)
    cfg.basedir = str(tmp_path)
    cfg.expname = "joint_pcp"
    cfg.fine_train.weight_pcp = 0.5
    cfg.fine_train.weight_style = 0.2
    cfg.fine_train.weight_gan = 0.05
    cfg.fine_train.allow_random_vgg = True
    dd = _data_with_srgt()
    args = types.SimpleNamespace(
        seed=0, no_reload=True, ftdv_path="", ftsr_path="", i_print=4,
        i_val=0, i_weights=0, test_tile=0,
    )
    xyz_min, xyz_max = trainer.compute_bbox_by_cam_frustrm(
        cfg, dd["HW"], dd["Ks"], dd["poses"], dd["i_train"], dd["near"],
        dd["far"])
    sr_trainer.scene_rep_reconstruction_sr_patch(
        args, cfg, cfg.fine_model_and_render, cfg.fine_train,
        xyz_min, xyz_max, dd, stage="fine")
    assert os.path.exists(os.path.join(cfg.basedir, "joint_pcp",
                                       "fine_last.npz"))


def test_joint_training_step_runs_and_saves(joint_cfg):
    dd = _data_with_srgt()
    args = types.SimpleNamespace(
        seed=0, no_reload=True, ftdv_path="", ftsr_path="", i_print=4, i_val=0,
        i_weights=0, test_tile=0,
    )
    xyz_min, xyz_max = trainer.compute_bbox_by_cam_frustrm(
        joint_cfg, dd["HW"], dd["Ks"], dd["poses"], dd["i_train"], dd["near"], dd["far"]
    )
    (model_mod, model_cfg, params, buffers, sr_model, sr_params
     ) = sr_trainer.scene_rep_reconstruction_sr_patch(
        args, joint_cfg, joint_cfg.fine_model_and_render, joint_cfg.fine_train,
        xyz_min, xyz_max, dd, stage="fine",
    )
    ckpt = os.path.join(joint_cfg.basedir, "joint_smoke", "fine_last.npz")
    assert os.path.exists(ckpt)

    # joint checkpoint round-trips with the SR + discriminator trees
    mm, mc, p2, b2, sr2, d2, ds2, step = sr_trainer.load_joint(ckpt, joint_cfg.data.ndc)
    assert sr2 is not None and d2 is not None
    assert step == 8

    # evaluation path: full-frame render -> SR -> metrics (tiled and untiled)
    render_kwargs = {"near": dd["near"], "far": dd["far"], "bg": 1.0, "stepsize": 0.5}
    val = sr_trainer.evaluate_sr(
        args, joint_cfg, joint_cfg.fine_model_and_render, model_mod, model_cfg,
        params, buffers, sr_model, sr_params, dd, render_kwargs, sr_ratio=4,
        eval_lpips=False,
    )
    assert np.isfinite(val["psnr_sr"])
    assert val["sr_frames"][0].shape == (64, 64, 3)

    args.test_tile = 6
    val_tiled = sr_trainer.evaluate_sr(
        args, joint_cfg, joint_cfg.fine_model_and_render, model_mod, model_cfg,
        params, buffers, sr_model, sr_params, dd, render_kwargs, sr_ratio=4,
        eval_lpips=False,
    )
    assert val_tiled["sr_frames"][0].shape == (64, 64, 3)

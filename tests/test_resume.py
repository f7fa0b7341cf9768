"""Checkpoint-resume correctness: a run trained N steps, checkpointed, and
resumed for M more steps must MATCH an unbroken N+M-step run bit-for-bit --
optimizer moments, lr-decay clock, batch stream, and RNG stream included
(reference restores optimizer state via lib/utils.py:53-59; our step-indexed
samplers/keys additionally make the data+noise streams resume-stable)."""

import os
import types

import numpy as np
import pytest
import jax

from fourk_nerf_tpu.config import load_config
from fourk_nerf_tpu.train import sr_trainer, trainer
from test_train_smoke import _make_synthetic_scene
from test_sr_trainer import _data_with_srgt

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "fourk_nerf_tpu", "configs")


def _enc_cfg(basedir, n_iters):
    cfg = load_config(os.path.join(CFG_DIR, "syn", "syn_default.py"))
    cfg.basedir = basedir
    cfg.expname = "resume"
    cfg.fine_train.N_iters = n_iters
    cfg.fine_train.N_rand = 256
    cfg.fine_train.pg_scale = [8]  # boundary BEFORE the checkpoint at 10
    cfg.fine_train.ray_sampler = "flatten"
    cfg.fine_model_and_render.num_voxels = 16**3
    cfg.fine_model_and_render.num_voxels_base = 16**3
    cfg.fine_model_and_render.rgbnet_dim = 6
    cfg.fine_model_and_render.rgbnet_width = 16
    return cfg


def _run_encoder(basedir, n_iters, data_dict, no_reload_optimizer=False):
    cfg = _enc_cfg(basedir, n_iters)
    args = types.SimpleNamespace(
        seed=0, no_reload=False, no_reload_optimizer=no_reload_optimizer,
        ft_path="", i_print=100, i_val=0, i_weights=0,
    )
    xyz_min, xyz_max = trainer.compute_bbox_by_cam_frustrm(
        cfg, data_dict["HW"], data_dict["Ks"], data_dict["poses"],
        data_dict["i_train"], data_dict["near"], data_dict["far"],
    )
    return trainer.scene_rep_reconstruction(
        args, cfg, cfg.fine_model_and_render, cfg.fine_train,
        xyz_min, xyz_max, data_dict, stage="fine",
    )


def _assert_trees_equal(a, b, path=""):
    if isinstance(a, dict):
        assert set(a) == set(b), (path, set(a), set(b))
        for k in a:
            _assert_trees_equal(a[k], b[k], f"{path}/{k}")
    else:
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=path)


def test_encoder_resume_bit_exact(tmp_path):
    data_dict = _make_synthetic_scene()
    # unbroken 20-step run
    _, _, p_full, _ = _run_encoder(str(tmp_path / "A"), 20, data_dict)
    # 10 steps, checkpoint, resume to 20 (crosses the pg_scale=[8] boundary
    # before the checkpoint, so opt reset + steps_since_reset are exercised)
    _run_encoder(str(tmp_path / "B"), 10, data_dict)
    _, _, p_resumed, _ = _run_encoder(str(tmp_path / "B"), 20, data_dict)
    _assert_trees_equal(p_full, p_resumed)


@pytest.mark.slow
def test_encoder_no_reload_optimizer_flag(tmp_path):
    data_dict = _make_synthetic_scene()
    _run_encoder(str(tmp_path / "C"), 10, data_dict)
    # with --no_reload_optimizer the moments restart: result must still be
    # finite but DIFFER from the unbroken run (the flag does something)
    _, _, p_full, _ = _run_encoder(str(tmp_path / "D"), 14, data_dict)
    _, _, p_nro, _ = _run_encoder(str(tmp_path / "C"), 14, data_dict,
                                  no_reload_optimizer=True)
    assert np.isfinite(np.asarray(p_nro["density"])).all()
    assert not np.array_equal(np.asarray(p_full["density"]),
                              np.asarray(p_nro["density"]))


def _joint_cfg(basedir, n_iters):
    cfg = load_config(os.path.join(CFG_DIR, "syn", "chair_joint_1x_l1_gan.py"))
    cfg.basedir = basedir
    cfg.expname = "jresume"
    cfg.data.load_sr = 1
    cfg.data.factor = 4
    cfg.fine_train.N_iters = n_iters
    cfg.fine_train.N_patch = 8
    cfg.fine_train.pg_scale = []
    cfg.fine_train.weight_pcp = 0
    cfg.fine_train.weight_gan = 0.05
    cfg.fine_model_and_render.num_voxels = 16**3
    cfg.fine_model_and_render.num_voxels_base = 16**3
    cfg.fine_model_and_render.rgbnet_dim = 6
    cfg.fine_model_and_render.rgbnet_width = 16
    cfg.fine_model_and_render.num_cond = 1
    cfg.fine_model_and_render.dim_rend = 3
    return cfg


def _run_joint(basedir, n_iters, dd):
    cfg = _joint_cfg(basedir, n_iters)
    args = types.SimpleNamespace(
        seed=0, no_reload=False, no_reload_optimizer=False, ftdv_path="",
        ftsr_path="", i_print=100, i_val=0, i_weights=0, test_tile=0,
    )
    xyz_min, xyz_max = trainer.compute_bbox_by_cam_frustrm(
        cfg, dd["HW"], dd["Ks"], dd["poses"], dd["i_train"], dd["near"], dd["far"]
    )
    return sr_trainer.scene_rep_reconstruction_sr_patch(
        args, cfg, cfg.fine_model_and_render, cfg.fine_train,
        xyz_min, xyz_max, dd, stage="fine",
    )


@pytest.mark.slow
def test_joint_resume_restores_sr_disc_and_optimizers(tmp_path):
    dd = _data_with_srgt()
    _, _, p_full, _, _, sr_full = _run_joint(str(tmp_path / "A"), 8, dd)
    _run_joint(str(tmp_path / "B"), 4, dd)
    _, _, p_res, _, _, sr_res = _run_joint(str(tmp_path / "B"), 8, dd)
    _assert_trees_equal(p_full, p_res)
    _assert_trees_equal(sr_full, sr_res)


@pytest.mark.slow
def test_encoder_resume_bit_exact_patch_box(tmp_path):
    """Resume stability holds for the patch_box slab-sweep train path too
    (step-indexed patch sampler + per-view static plans)."""
    data_dict = _make_synthetic_scene()

    def run(basedir, n_iters):
        cfg = _enc_cfg(basedir, n_iters)
        cfg.fine_train.ray_sampler = "patch_box"
        args = types.SimpleNamespace(
            seed=0, no_reload=False, no_reload_optimizer=False,
            ft_path="", i_print=100, i_val=0, i_weights=0,
        )
        xyz_min, xyz_max = trainer.compute_bbox_by_cam_frustrm(
            cfg, data_dict["HW"], data_dict["Ks"], data_dict["poses"],
            data_dict["i_train"], data_dict["near"], data_dict["far"],
        )
        return trainer.scene_rep_reconstruction(
            args, cfg, cfg.fine_model_and_render, cfg.fine_train,
            xyz_min, xyz_max, data_dict, stage="fine",
        )

    _, _, p_full, _ = run(str(tmp_path / "A"), 20)
    run(str(tmp_path / "B"), 10)
    _, _, p_resumed, _ = run(str(tmp_path / "B"), 20)
    _assert_trees_equal(p_full, p_resumed)

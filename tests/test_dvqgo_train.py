"""DirectQVGO training semantics: the EMA codebook must actually LEARN during
the encoder train loop (reference VQGrid updates it in-place inside forward,
/root/reference/lib/grid.py:38-103; selected by mode_type='adain_vq',
run.py:287-293)."""

import os
import types

import numpy as np

from fourk_nerf_tpu.config import load_config
from fourk_nerf_tpu.train import trainer
from test_sr_trainer_ndc import _ndc_data

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "fourk_nerf_tpu", "configs")


def test_vq_codebook_learns_during_training(tmp_path):
    dd = _ndc_data()
    cfg = load_config(os.path.join(CFG_DIR, "llff", "fern_lg_pretrain.py"))
    cfg.basedir = str(tmp_path)
    cfg.expname = "vq_smoke"
    cfg.data.ndc = True
    cfg.data.rand_bkgd = False
    cfg.coarse_train.N_iters = 0
    cfg.fine_train.N_iters = 6
    cfg.fine_train.N_rand = 128
    cfg.fine_train.pg_scale = []
    cfg.fine_train.ray_sampler = "flatten"
    cfg.fine_model_and_render.mode_type = "adain_vq"
    cfg.fine_model_and_render.num_voxels = 32 * 32 * 8
    cfg.fine_model_and_render.mpi_depth = 8
    cfg.fine_model_and_render.rgbnet_dim = 6
    cfg.fine_model_and_render.rgbnet_width = 16
    cfg.fine_model_and_render.n_cluster = 64
    cfg.fine_model_and_render.stepsize = 1.0

    args = types.SimpleNamespace(
        seed=0, no_reload=True, no_reload_optimizer=False, ft_path="",
        i_print=100, i_val=0, i_weights=0,
    )
    xyz_min, xyz_max = trainer.compute_bbox_by_cam_frustrm(
        cfg, dd["HW"], dd["Ks"], dd["poses"], dd["i_train"], dd["near"], dd["far"]
    )
    from fourk_nerf_tpu.models import dvqgo

    model_mod, model_cfg, params, buffers = trainer.scene_rep_reconstruction(
        args, cfg, cfg.fine_model_and_render, cfg.fine_train,
        xyz_min, xyz_max, dd, stage="fine",
    )
    assert model_mod is dvqgo

    # fresh init with the same seed gives the untouched codebook to diff vs
    import jax

    _, buffers0 = dvqgo.init(model_cfg, jax.random.split(jax.random.PRNGKey(0))[1])
    embed0 = np.asarray(buffers0["vq_state"]["embed"])
    embed1 = np.asarray(buffers["vq_state"]["embed"])
    assert embed0.shape == embed1.shape
    # EMA statistics moved: cluster sizes accumulated and the codebook changed
    assert float(np.abs(np.asarray(buffers["vq_state"]["cluster_size"])).sum()) > 0
    assert not np.allclose(embed0, embed1)

    # the projection MLP (reference: part of model.k0 under lrate_k0) trained
    assert "k0_vq" in params

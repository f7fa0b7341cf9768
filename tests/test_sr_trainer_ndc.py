"""Joint-training smoke on an NDC (LLFF-style) scene: exercises the
plane-sweep patch rendering inside the jitted G step."""

import os
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fourk_nerf_tpu.config import load_config
from fourk_nerf_tpu.models import dmpigo
from fourk_nerf_tpu.ops import rays as ray_ops
from fourk_nerf_tpu.train import sr_trainer

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "fourk_nerf_tpu", "configs")


def _ndc_data(H=32, W=32, n_views=3):
    f = 40.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], dtype=np.float32)
    poses = []
    for dx in np.linspace(-0.05, 0.05, n_views):
        c2w = np.eye(4, dtype=np.float32)
        c2w[0, 3] = dx
        c2w[2, 3] = 1.0
        poses.append(c2w[:3, :4])
    poses = np.stack(poses)

    # teacher render for ground truth
    cfg_t = dmpigo.make_config(
        xyz_min=[-2.0, -2.0, -1.0], xyz_max=[2.0, 2.0, 1.0],
        num_voxels=48 * 48 * 16, mpi_depth=16, rgbnet_dim=0,
    )
    params_t, buffers_t = dmpigo.init(cfg_t, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    params_t["density"] = jnp.asarray(rng.normal(0, 2, params_t["density"].shape).astype(np.float32))
    params_t["k0"] = jnp.asarray(rng.normal(0, 1, params_t["k0"].shape).astype(np.float32))
    images = []
    for c2w in poses:
        ro, rd, vd = ray_ops.get_rays_of_a_view(H, W, K, c2w, ndc=True, inverse_y=False,
                                                flip_x=False, flip_y=False)
        out = dmpigo.forward(
            cfg_t, params_t, buffers_t,
            jnp.asarray(np.asarray(ro).reshape(-1, 3)),
            jnp.asarray(np.asarray(rd).reshape(-1, 3)),
            jnp.asarray(np.asarray(vd).reshape(-1, 3)),
            stepsize=1.0, bg=0.0,
        )
        images.append(np.clip(np.asarray(out["rgb_marched"]).reshape(H, W, 3), 0, 1))
    images = np.stack(images).astype(np.float32)
    srgt = np.repeat(np.repeat(images, 4, 1), 4, 2)
    return dict(
        hwf=[H, W, f], HW=np.array([[H, W]] * n_views), Ks=np.stack([K] * n_views),
        near=0.0, far=1.0, near_clip=None,
        i_train=np.arange(n_views - 1), i_val=np.array([n_views - 1]),
        i_test=np.array([n_views - 1]),
        poses=poses, render_poses=poses,
        images=images, irregular_shape=False, srgt=srgt,
        w2c=np.stack([np.eye(3, dtype=np.float32)] * n_views),
    )


@pytest.mark.filterwarnings("ignore")
def test_ndc_joint_training_uses_sweep(capsys, tmp_path):
    cfg = load_config(os.path.join(CFG_DIR, "llff", "fern_lg_joint_l1_gan.py"))
    cfg.basedir = str(tmp_path)
    cfg.expname = "ndc_smoke"
    cfg.data.ndc = True
    cfg.data.load_sr = 1
    cfg.data.factor = 4  # sr_ratio 4
    cfg.data.rand_bkgd = False
    cfg.fine_train.N_iters = 6
    cfg.fine_train.N_patch = 8
    cfg.fine_train.pg_scale = []
    cfg.fine_train.weight_pcp = 0
    cfg.fine_train.weight_gan = 0.05
    cfg.fine_model_and_render.num_voxels = 64 * 64 * 16
    cfg.fine_model_and_render.mpi_depth = 16
    cfg.fine_model_and_render.stepsize = 1.0
    cfg.fine_model_and_render.rgbnet_dim = 6
    cfg.fine_model_and_render.rgbnet_width = 16
    cfg.fine_model_and_render.fast_color_thres = 1.0 / 16 / 5

    dd = _ndc_data()
    args = types.SimpleNamespace(
        seed=0, no_reload=True, ftdv_path="", ftsr_path="", i_print=3, i_val=0,
        i_weights=0, test_tile=0,
    )
    xyz_min = np.array([-2.0, -2.0, -1.0])
    xyz_max = np.array([2.0, 2.0, 1.0])
    (model_mod, model_cfg, params, buffers, sr_model, sr_params
     ) = sr_trainer.scene_rep_reconstruction_sr_patch(
        args, cfg, cfg.fine_model_and_render, cfg.fine_train,
        xyz_min, xyz_max, dd, stage="fine",
    )
    out = capsys.readouterr().out
    assert "plane-sweep patch rendering ON" in out, out
    assert os.path.exists(os.path.join(str(tmp_path), "ndc_smoke", "fine_last.npz"))

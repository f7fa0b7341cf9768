"""Integration smoke test: 60-step bounded-scene training on a tiny synthetic
dataset, asserting PSNR improves and checkpoints round-trip (SURVEY.md
section 4 test strategy)."""

import os
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fourk_nerf_tpu.config import load_config
from fourk_nerf_tpu.models import dvgo
from fourk_nerf_tpu.ops import rays as ray_ops
from fourk_nerf_tpu.train import checkpoints, trainer

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "fourk_nerf_tpu", "configs")


def _look_at_pose(theta, radius=4.0):
    """Camera on the xy-circle at height 0, looking at the origin (OpenGL)."""
    cam = np.array([radius * np.cos(theta), radius * np.sin(theta), 0.5])
    forward = cam / np.linalg.norm(cam)  # -z looks at origin
    up0 = np.array([0.0, 0.0, 1.0])
    right = np.cross(up0, forward)
    right = right / np.linalg.norm(right)
    up = np.cross(forward, right)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, forward, cam
    return c2w


def _make_synthetic_scene(H=16, W=16, n_views=6, seed=0):
    """Ground truth rendered from a 'teacher' DVGO with a gaussian density blob."""
    focal = 20.0
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]], dtype=np.float32)
    poses = np.stack([_look_at_pose(t) for t in np.linspace(0, 2 * np.pi, n_views, endpoint=False)])

    cfg_t = dvgo.make_config(
        xyz_min=[-1.5, -1.5, -1.5], xyz_max=[1.5, 1.5, 1.5],
        num_voxels=16**3, num_voxels_base=16**3, alpha_init=1e-2,
        rgbnet_dim=0, fast_color_thres=1e-4,
    )
    params_t, buffers_t = dvgo.init(cfg_t, jax.random.PRNGKey(seed))
    # gaussian blob density + a fixed color
    X, Y, Z = cfg_t.world_size
    g = np.stack(np.meshgrid(
        np.linspace(-1.5, 1.5, X), np.linspace(-1.5, 1.5, Y), np.linspace(-1.5, 1.5, Z),
        indexing="ij"), -1)
    r2 = np.sum(g**2, -1)
    params_t["density"] = jnp.asarray(20.0 * np.exp(-r2 / 0.3)[..., None] - 2.0, dtype=jnp.float32)
    params_t["k0"] = jnp.asarray(
        np.stack([2.0 - 4.0 * r2, np.zeros_like(r2), -2.0 + 4.0 * r2], -1), dtype=jnp.float32
    )

    images = []
    for c2w in poses:
        ro, rd, vd = ray_ops.get_rays_of_a_view(
            H, W, K, c2w[:3, :4], ndc=False, inverse_y=False, flip_x=False, flip_y=False
        )
        out = dvgo.forward(
            cfg_t, params_t, buffers_t,
            jnp.asarray(np.asarray(ro).reshape(-1, 3)),
            jnp.asarray(np.asarray(rd).reshape(-1, 3)),
            jnp.asarray(np.asarray(vd).reshape(-1, 3)),
            stepsize=0.5, near=2.0, far=6.0, bg=1.0,
        )
        images.append(np.asarray(out["rgb_marched"]).reshape(H, W, 3))
    images = np.clip(np.stack(images), 0, 1)

    n = len(poses)
    return dict(
        hwf=[H, W, focal], HW=np.array([[H, W]] * n), Ks=np.stack([K] * n),
        near=2.0, far=6.0, near_clip=None,
        i_train=np.arange(n - 1), i_val=np.array([n - 1]), i_test=np.array([n - 1]),
        poses=poses[:, :3, :4], render_poses=poses[:, :3, :4],
        images=images.astype(np.float32), irregular_shape=False,
    )


@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    cfg = load_config(os.path.join(CFG_DIR, "syn", "syn_default.py"))
    cfg.basedir = str(tmp_path_factory.mktemp("logs"))
    cfg.expname = "smoke"
    cfg.coarse_train.N_iters = 60
    cfg.coarse_train.N_rand = 256
    cfg.coarse_train.pervoxel_lr = True
    cfg.coarse_train.pg_scale = []
    cfg.fine_train.N_iters = 40
    cfg.fine_train.N_rand = 256
    cfg.fine_train.pg_scale = [20]
    cfg.fine_train.ray_sampler = "in_maskcache"
    cfg.coarse_model_and_render.num_voxels = 12**3
    cfg.coarse_model_and_render.num_voxels_base = 12**3
    cfg.coarse_model_and_render.alpha_init = 1e-2  # tiny run: learnable alphas
    cfg.fine_model_and_render.num_voxels = 16**3
    cfg.fine_model_and_render.num_voxels_base = 16**3
    cfg.fine_model_and_render.rgbnet_dim = 6
    cfg.fine_model_and_render.rgbnet_width = 16
    cfg.fine_model_and_render.world_bound_scale = 1.05
    return cfg


def test_end_to_end_training_improves_psnr(tiny_cfg):
    data_dict = _make_synthetic_scene()
    args = types.SimpleNamespace(
        seed=0, no_reload=True, ft_path="", i_print=20, i_val=0, i_weights=0,
    )
    model_mod, model_cfg, params, buffers = trainer.train(args, tiny_cfg, data_dict)

    # render the held-out view and check it beats a trivial baseline
    render_kwargs = {"near": 2.0, "far": 6.0, "bg": 1.0, "stepsize": 0.5}
    res = trainer.render_viewpoints(
        model_mod, model_cfg, params, buffers,
        data_dict["poses"][data_dict["i_val"]],
        data_dict["HW"][data_dict["i_val"]],
        data_dict["Ks"][data_dict["i_val"]],
        cfg=tiny_cfg, render_kwargs=render_kwargs,
        gt_imgs=[data_dict["images"][i] for i in data_dict["i_val"]],
        eval_ssim=False, chunk=256,
    )
    gt = data_dict["images"][data_dict["i_val"][0]]
    baseline_psnr = -10 * np.log10(np.mean((np.ones_like(gt) - gt) ** 2))
    assert res["psnrs"][0] > baseline_psnr + 2, (res["psnrs"], baseline_psnr)

    # checkpoints written by both stages
    assert os.path.exists(os.path.join(tiny_cfg.basedir, "smoke", "coarse_last.npz"))
    fine_ckpt = os.path.join(tiny_cfg.basedir, "smoke", "fine_last.npz")
    assert os.path.exists(fine_ckpt)

    # checkpoint self-description round-trip (SURVEY.md 3.5)
    kwargs, params2, buffers2, opt_state, step, _ = checkpoints.load_checkpoint(fine_ckpt)
    cfg2 = model_mod.make_config(**kwargs)
    assert cfg2.world_size == model_cfg.world_size
    assert step == 40
    out = model_mod.forward(
        cfg2, params2, buffers2,
        jnp.zeros((4, 3)), jnp.asarray([[0.0, 0.0, -1.0]] * 4), jnp.asarray([[0.0, 0.0, -1.0]] * 4),
        stepsize=0.5, near=2.0, far=6.0, bg=1.0,
    )
    assert np.isfinite(np.asarray(out["rgb_marched"])).all()


def test_end_to_end_training_patch_inmask(tiny_cfg, tmp_path):
    """Encoder-side patch samplers drive training end-to-end: the fine stage
    uses 'patch_inmask' (coarse-geometry-filtered coherent patches,
    /root/reference/lib/dvgo.py:786-820 + run_sr.py:836-843 semantics)."""
    import copy

    cfg = copy.deepcopy(tiny_cfg)
    cfg.basedir = str(tmp_path)
    cfg.expname = "smoke_patch"
    cfg.fine_train.ray_sampler = "patch_inmask"
    cfg.fine_train.N_rand = 8 * 64  # patch side 8 on the 16px images
    data_dict = _make_synthetic_scene()
    args = types.SimpleNamespace(
        seed=0, no_reload=True, ft_path="", i_print=20, i_val=0, i_weights=0,
    )
    model_mod, model_cfg, params, buffers = trainer.train(args, cfg, data_dict)

    render_kwargs = {"near": 2.0, "far": 6.0, "bg": 1.0, "stepsize": 0.5}
    res = trainer.render_viewpoints(
        model_mod, model_cfg, params, buffers,
        data_dict["poses"][data_dict["i_val"]],
        data_dict["HW"][data_dict["i_val"]],
        data_dict["Ks"][data_dict["i_val"]],
        cfg=cfg, render_kwargs=render_kwargs,
        gt_imgs=[data_dict["images"][i] for i in data_dict["i_val"]],
        eval_ssim=False, chunk=256,
    )
    gt = data_dict["images"][data_dict["i_val"][0]]
    baseline_psnr = -10 * np.log10(np.mean((np.ones_like(gt) - gt) ** 2))
    assert res["psnrs"][0] > baseline_psnr + 2, (res["psnrs"], baseline_psnr)

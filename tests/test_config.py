import os

from fourk_nerf_tpu.config import load_config

pytestmark = __import__('pytest').mark.smoke

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "fourk_nerf_tpu", "configs")


def test_base_inheritance_fern_pretrain():
    cfg = load_config(os.path.join(CFG_DIR, "llff", "fern_lg_pretrain.py"))
    # from the leaf
    assert cfg.expname == "pretrain_fern_l1"
    assert cfg.data.factor == 4
    assert cfg.data.llffhold == 8
    assert cfg.fine_model_and_render.viewbase_pe == 0
    # from llff_default_lg
    assert cfg.data.ndc is True
    assert cfg.data.rand_bkgd is True
    assert cfg.fine_train.N_iters == 30000
    assert cfg.fine_train.N_rand == 4096
    assert cfg.fine_model_and_render.mpi_depth == 256
    assert cfg.fine_model_and_render.stepsize == 1.0
    assert cfg.fine_model_and_render.rgbnet_dim == 9
    assert cfg.fine_model_and_render.rgbnet_width == 64
    assert abs(cfg.fine_model_and_render.fast_color_thres - 1.0 / 256 / 5) < 1e-12
    # from default
    assert cfg.coarse_train.N_iters == 0  # overridden by llff base
    assert cfg.fine_train.skip_zero_grad_fields == ["density", "k0"]
    assert cfg.coarse_model_and_render.alpha_init == 1e-6
    # leaf width=None overrides base width=1008
    assert cfg.data.width is None


def test_nested_merge_does_not_drop_sibling_keys():
    cfg = load_config(os.path.join(CFG_DIR, "llff", "fern_lg_joint_l1_gan.py"))
    assert cfg.fine_train.weight_pcp == 0.5
    assert cfg.fine_train.weight_distortion == 0.01  # from llff base, not dropped
    assert cfg.fine_train.ray_sampler == "patch_mimg"
    assert cfg.fine_train.N_patch == 64
    assert cfg.data.load_sr == 1
    assert cfg.fine_model_and_render.num_cond == 1


def test_attribute_and_item_access():
    cfg = load_config(os.path.join(CFG_DIR, "default.py"))
    assert cfg["data"]["ndc"] is False
    assert cfg.data.get("missing", 42) == 42
    assert "lrate_density" in cfg.coarse_train.keys()

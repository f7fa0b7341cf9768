"""VGG19 perceptual-loss import path, exercised end-to-end with a
synthetic-weight torchvision-style ``.pth`` (the real weights can't be
downloaded in a zero-egress image): the Flax tower must reproduce torch
conv/relu/maxpool features, and the trainer must refuse to start when
``weight_pcp > 0`` with no weights available."""

import os
import types

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from fourk_nerf_tpu.train import sr_losses

# torchvision vgg19 'features' conv indices (conv+relu pairs, 'M' pools)
_TORCH_IDX = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34]
_POOL_AFTER = {3, 8, 17, 26, 35}  # maxpool module indices


def _synthetic_vgg19_sd(seed=0):
    rng = np.random.default_rng(seed)
    chans = [c for item in sr_losses._VGG19_PLAN if isinstance(item, tuple)
             for c in [item[1]]]
    sd = {}
    in_ch = 3
    for idx, out_ch in zip(_TORCH_IDX, chans):
        sd[f"features.{idx}.weight"] = torch.tensor(
            rng.normal(0, 0.05, (out_ch, in_ch, 3, 3)).astype(np.float32))
        sd[f"features.{idx}.bias"] = torch.tensor(
            rng.normal(0, 0.01, (out_ch,)).astype(np.float32))
        in_ch = out_ch
    return sd


def _torch_features(sd, x_nhwc, wanted):
    """Reference forward: ImageNet-normalized conv/relu/maxpool stack."""
    import torch.nn.functional as F

    mean = torch.tensor(sr_losses._IMAGENET_MEAN).view(1, 3, 1, 1)
    std = torch.tensor(sr_losses._IMAGENET_STD).view(1, 3, 1, 1)
    x = torch.tensor(np.moveaxis(x_nhwc, -1, 1))
    x = (x - mean) / std
    out = {}
    names = [item[0] for item in sr_losses._VGG19_PLAN if isinstance(item, tuple)]
    ni = 0
    for mi in range(max(_TORCH_IDX) + 2):
        if mi in _POOL_AFTER:
            x = F.max_pool2d(x, 2, 2)
        if mi in _TORCH_IDX:
            x = F.relu(F.conv2d(x, sd[f"features.{mi}.weight"],
                                sd[f"features.{mi}.bias"], padding=1))
            if names[ni] in wanted:
                out[names[ni]] = np.moveaxis(x.numpy(), 1, -1)
            ni += 1
    return out


def test_import_vgg19_torch_end_to_end(tmp_path):
    sd = _synthetic_vgg19_sd()
    pth = tmp_path / "vgg19-synthetic.pth"
    torch.save(sd, str(pth))

    params = sr_losses.import_vgg19_torch(str(pth))
    wanted = ("conv3_4", "conv4_4", "conv5_4")
    model = sr_losses.VGG19Features(layers=wanted)

    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    got = model.apply({"params": params}, jnp.asarray(x))
    ref = _torch_features(sd, x, wanted)
    for name in wanted:
        np.testing.assert_allclose(np.asarray(got[name]), ref[name],
                                   rtol=1e-2, atol=1e-2, err_msg=name)

    # the loss itself runs through PerceptualLoss with the imported params
    pl = sr_losses.PerceptualLoss(perceptual_weight=0.5, style_weight=0.2,
                                  vgg_params=params)
    p, s = pl(jnp.asarray(x), jnp.asarray(np.roll(x, 3, axis=1)))
    assert float(p) > 0 and float(s) > 0


def test_trainer_refuses_weight_pcp_without_weights(tmp_path, monkeypatch):
    """weight_pcp > 0 with no VGG weights must be a hard error, not a
    silently different objective (VERDICT item 5)."""
    from fourk_nerf_tpu.config import load_config
    from fourk_nerf_tpu.train import sr_trainer, trainer
    from test_sr_trainer import _data_with_srgt

    monkeypatch.setattr(sr_losses, "find_vgg19_weights", lambda: None)
    cfg_dir = os.path.join(os.path.dirname(__file__), "..", "fourk_nerf_tpu", "configs")
    cfg = load_config(os.path.join(cfg_dir, "syn", "chair_joint_1x_l1_gan.py"))
    cfg.basedir = str(tmp_path)
    cfg.expname = "pcp_refuse"
    cfg.data.load_sr = 1
    cfg.data.factor = 4
    cfg.fine_train.N_iters = 1
    cfg.fine_train.N_patch = 8
    cfg.fine_train.weight_pcp = 0.5
    cfg.fine_train.weight_gan = 0
    cfg.fine_model_and_render.num_voxels = 16**3
    cfg.fine_model_and_render.rgbnet_dim = 6
    cfg.fine_model_and_render.rgbnet_width = 16
    cfg.fine_model_and_render.dim_rend = 3

    dd = _data_with_srgt()
    args = types.SimpleNamespace(seed=0, no_reload=True, ftdv_path="", ftsr_path="",
                                 i_print=1, i_val=0, i_weights=0, test_tile=0)
    xyz_min, xyz_max = trainer.compute_bbox_by_cam_frustrm(
        cfg, dd["HW"], dd["Ks"], dd["poses"], dd["i_train"], dd["near"], dd["far"]
    )
    with pytest.raises(RuntimeError, match="weight_pcp"):
        sr_trainer.scene_rep_reconstruction_sr_patch(
            args, cfg, cfg.fine_model_and_render, cfg.fine_train,
            xyz_min, xyz_max, dd, stage="fine",
        )

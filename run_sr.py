#!/usr/bin/env python3
"""Joint 4K training / eval CLI (TPU-native rebuild of /root/reference/run_sr.py).

Usage:
    python run_sr.py --config fourk_nerf_tpu/configs/llff/fern_lg_joint_l1.py \
        --ftdv_path <encoder ckpt> --ftsr_path <RealESRNet init> --test_tile 510
"""

from __future__ import annotations

import argparse
import os
import random

import numpy as np


def config_parser():
    """CLI flags (parity with /root/reference/run_sr.py:20-71)."""
    p = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--config", required=True)
    p.add_argument("--seed", type=int, default=777)
    p.add_argument("--no_reload", action="store_true")
    p.add_argument("--no_reload_optimizer", action="store_true")
    p.add_argument("--ft_path", type=str, default="")
    p.add_argument("--ftdv_path", type=str, default="", help="pretrained encoder ckpt")
    p.add_argument("--ftdvcoa_path", type=str, default="", help="coarse encoder ckpt")
    p.add_argument("--ftsr_path", type=str, default="", help="SR net init (.pth/.npz)")
    p.add_argument("--sr_path", type=str, default="", help="SR net for render_only")
    p.add_argument("--test_tile", type=int, default=0, help="tile size for 4K SR (e.g. 510)")
    # testing options
    p.add_argument("--render_only", action="store_true")
    p.add_argument("--render_test", action="store_true")
    p.add_argument("--render_train", action="store_true")
    p.add_argument("--render_video", action="store_true")
    p.add_argument("--render_video_flipy", action="store_true")
    p.add_argument("--render_video_rot90", default=0, type=int)
    p.add_argument("--render_video_factor", type=float, default=0)
    p.add_argument("--dump_images", action="store_true")
    p.add_argument("--eval_ssim", action="store_true")
    p.add_argument("--eval_lpips_alex", action="store_true")
    p.add_argument("--eval_lpips_vgg", action="store_true")
    # logging/saving
    p.add_argument("--i_print", type=int, default=500)
    p.add_argument("--i_val", type=int, default=1000)
    p.add_argument("--i_weights", type=int, default=100000)
    return p


def main():
    args = config_parser().parse_args()

    from fourk_nerf_tpu.config import load_config
    from fourk_nerf_tpu.utils.logging import ScalarWriter, dump_provenance

    cfg = load_config(args.config)
    np.random.seed(args.seed)
    random.seed(args.seed)

    rundir = os.path.join(cfg.basedir, cfg.expname)
    dump_provenance(cfg, args, rundir)
    writer = ScalarWriter(os.path.join(rundir, "tb"))

    import run as run_mod

    data_dict = run_mod.load_everything(args, cfg)
    # joint training keeps srgt + w2c (reference run_sr.py:204-208)

    from fourk_nerf_tpu.train import sr_trainer, trainer

    render_kwargs = {
        "near": float(data_dict["near"]), "far": float(data_dict["far"]),
        "bg": 1.0 if cfg.data.white_bkgd else 0.0,
        "stepsize": float(cfg.fine_model_and_render.stepsize),
    }
    sr_ratio = int(cfg.data.factor / cfg.data.load_sr) if cfg.data.load_sr else 4

    if not args.render_only:
        xyz_min, xyz_max = trainer.compute_bbox_by_cam_frustrm(
            cfg, data_dict["HW"], data_dict["Ks"], data_dict["poses"],
            data_dict["i_train"], data_dict["near"], data_dict["far"],
        )
        (model_mod, model_cfg, params, buffers, sr_model, sr_params
         ) = sr_trainer.scene_rep_reconstruction_sr_patch(
            args, cfg, cfg.fine_model_and_render, cfg.fine_train,
            xyz_min, xyz_max, data_dict, stage="fine", writer=writer,
        )
    else:
        from fourk_nerf_tpu.models import sr_esrnet

        ckpt = args.ft_path or os.path.join(rundir, "fine_last.npz")
        (model_mod, model_cfg, params, buffers, sr_params, _d, _ds, _step
         ) = sr_trainer.load_joint(ckpt, cfg.data.ndc)
        sr_model = sr_esrnet.SFTNet(
            n_in_colors=int(cfg.fine_model_and_render.dim_rend), scale=sr_ratio,
            num_cond=int(cfg.fine_model_and_render.get("num_cond", 1)),
        )
        if args.sr_path:
            import torch

            sd = torch.load(args.sr_path, map_location="cpu", weights_only=False)
            for pk in ("params_ema", "params"):
                if isinstance(sd, dict) and pk in sd:
                    sd = sd[pk]
                    break
            sr_params = sr_esrnet.merge_params(sr_params, sr_esrnet.import_sftnet_torch(sd))

    if args.render_test or args.render_only:
        val = sr_trainer.evaluate_sr(
            args, cfg, cfg.fine_model_and_render, model_mod, model_cfg, params, buffers,
            sr_model, sr_params, data_dict, render_kwargs, sr_ratio,
            split="i_test", eval_lpips=args.eval_lpips_vgg,
        )
        if args.dump_images:
            import imageio.v2 as imageio

            from fourk_nerf_tpu.utils.metrics import to8b

            outdir = os.path.join(rundir, "render_test_sr")
            os.makedirs(outdir, exist_ok=True)
            for i, frame in enumerate(val["sr_frames"]):
                imageio.imwrite(os.path.join(outdir, f"sr_{i:03d}.png"), to8b(frame))

    writer.close()
    print("done")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""VC-Encoder pretraining CLI (TPU-native rebuild of /root/reference/run.py).

Usage:
    python run.py --config fourk_nerf_tpu/configs/llff/fern_lg_pretrain.py --render_test
"""

from __future__ import annotations

import argparse
import os
import random

import numpy as np


def config_parser():
    """CLI flags (parity with /root/reference/run.py:22-63)."""
    p = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--config", required=True, help="config file path")
    p.add_argument("--seed", type=int, default=777)
    p.add_argument("--no_reload", action="store_true")
    p.add_argument("--no_reload_optimizer", action="store_true")
    p.add_argument("--ft_path", type=str, default="")
    p.add_argument("--export_bbox_and_cams_only", type=str, default="")
    p.add_argument("--export_coarse_only", type=str, default="")
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
    # distributed
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize (multi-host SPMD)")
    return p


def seed_everything(seed: int):
    np.random.seed(seed)
    random.seed(seed)


def load_everything(args, cfg):
    """Load + trim the data dict (reference run.py:183-206)."""
    from fourk_nerf_tpu.data import load_data

    data_dict = load_data(cfg.data)
    kept = {
        "hwf", "HW", "Ks", "near", "far", "near_clip", "i_train", "i_val", "i_test",
        "irregular_shape", "poses", "render_poses", "images",
    }
    if cfg.data.load_sr:
        kept.add("srgt")
        kept.add("w2c")
    for k in list(data_dict.keys()):
        if k not in kept:
            data_dict.pop(k)
    return data_dict


def main():
    parser = config_parser()
    args = parser.parse_args()

    from fourk_nerf_tpu.config import load_config
    from fourk_nerf_tpu.utils.logging import ScalarWriter, dump_provenance

    cfg = load_config(args.config)
    seed_everything(args.seed)

    from fourk_nerf_tpu.parallel import mesh as pmesh

    pmesh.maybe_initialize_distributed(args.multihost)

    rundir = os.path.join(cfg.basedir, cfg.expname)
    dump_provenance(cfg, args, rundir)
    writer = ScalarWriter(os.path.join(rundir, "tb"))

    data_dict = load_everything(args, cfg)

    from fourk_nerf_tpu.train import trainer

    if args.export_coarse_only:
        # dump the coarse alpha volume for tools/vis_export.py volume mode
        # (reference run.py:726-739)
        from fourk_nerf_tpu.models import dvgo
        from fourk_nerf_tpu.ops import render as render_ops
        from fourk_nerf_tpu.train import checkpoints

        ckpt = os.path.join(rundir, "coarse_last.npz")
        kwargs, params, buffers, *_ = checkpoints.load_checkpoint(ckpt)
        model_cfg = dvgo.make_config(**kwargs)
        alpha = np.asarray(render_ops.raw2alpha(
            params["density"][..., 0], model_cfg.act_shift, model_cfg.voxel_size_ratio
        ))
        np.savez_compressed(
            args.export_coarse_only, alpha=alpha,
            xyz_min=np.asarray(model_cfg.xyz_min), xyz_max=np.asarray(model_cfg.xyz_max),
        )
        print(f"wrote {args.export_coarse_only}")
        return

    if args.export_bbox_and_cams_only:
        xyz_min, xyz_max = trainer.compute_bbox_by_cam_frustrm(
            cfg, data_dict["HW"], data_dict["Ks"], data_dict["poses"],
            data_dict["i_train"], data_dict["near"], data_dict["far"],
            near_clip=data_dict.get("near_clip"),
        )
        np.savez_compressed(
            args.export_bbox_and_cams_only,
            xyz_min=xyz_min, xyz_max=xyz_max,
            cam_lst=np.asarray(data_dict["poses"][data_dict["i_train"]]),
        )
        return

    if not args.render_only:
        model_mod, model_cfg, params, buffers = trainer.train(args, cfg, data_dict, writer=writer)
    else:
        from fourk_nerf_tpu.models import dmpigo, dvgo
        from fourk_nerf_tpu.train import checkpoints

        ckpt = args.ft_path or os.path.join(rundir, "fine_last.npz")
        model_mod = dmpigo if cfg.data.ndc else dvgo
        kwargs, params, buffers, *_ = checkpoints.load_checkpoint(ckpt)
        model_cfg = model_mod.make_config(**kwargs)

    render_kwargs = {
        "near": float(data_dict["near"]), "far": float(data_dict["far"]),
        "bg": 1.0 if cfg.data.white_bkgd else 0.0,
        "stepsize": float(cfg.fine_model_and_render.stepsize),
    }

    def render_split(idx, name):
        outdir = os.path.join(rundir, f"render_{name}")
        os.makedirs(outdir, exist_ok=True)
        res = trainer.render_viewpoints(
            model_mod, model_cfg, params, buffers,
            data_dict["poses"][idx], data_dict["HW"][idx], data_dict["Ks"][idx],
            cfg=cfg, render_kwargs=render_kwargs,
            gt_imgs=[np.asarray(data_dict["images"][i]) for i in idx],
            eval_ssim=args.eval_ssim,
            eval_lpips_vgg=args.eval_lpips_vgg,
            eval_lpips_alex=args.eval_lpips_alex,
        )
        if args.dump_images:
            import imageio.v2 as imageio

            from fourk_nerf_tpu.utils.metrics import to8b

            for i, rgb in enumerate(res["rgbs"]):
                imageio.imwrite(os.path.join(outdir, f"{i:03d}.png"), to8b(rgb))
        return res

    if args.render_test:
        render_split(data_dict["i_test"], "test")
    if args.render_train:
        render_split(data_dict["i_train"], "train")
    if args.render_video:
        outdir = os.path.join(rundir, "render_video")
        os.makedirs(outdir, exist_ok=True)
        res = trainer.render_viewpoints(
            model_mod, model_cfg, params, buffers,
            np.asarray(data_dict["render_poses"]),
            np.tile(data_dict["HW"][0][None], (len(data_dict["render_poses"]), 1)),
            np.tile(data_dict["Ks"][0][None], (len(data_dict["render_poses"]), 1, 1)),
            cfg=cfg, render_kwargs=render_kwargs,
            render_factor=args.render_video_factor,
            render_video_flipy=args.render_video_flipy,
            render_video_rot90=args.render_video_rot90,
        )
        try:
            import imageio.v2 as imageio

            from fourk_nerf_tpu.utils.metrics import to8b

            imageio.mimwrite(
                os.path.join(outdir, "video.rgb.mp4"),
                to8b(res["rgbs"]), fps=30, quality=8,
            )
        except Exception as e:  # mp4 writer optional in this image
            print(f"video write skipped: {e}")

    writer.close()
    print("done")


if __name__ == "__main__":
    main()

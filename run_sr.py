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
    # distributed
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize (multi-host SPMD)")
    return p


def main():
    args = config_parser().parse_args()

    from fourk_nerf_tpu.config import load_config
    from fourk_nerf_tpu.utils.logging import ScalarWriter, dump_provenance

    cfg = load_config(args.config)
    np.random.seed(args.seed)
    random.seed(args.seed)

    from fourk_nerf_tpu.parallel import mesh as pmesh

    pmesh.maybe_initialize_distributed(args.multihost)

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
            near_clip=data_dict.get("near_clip"),
        )
        # --ftdvcoa_path: reuse a coarse checkpoint instead of running the
        # coarse stage -- tightens the bbox and bootstraps the free-space
        # mask (reference run_sr.py:1197-1225)
        coarse_ckpt_path = None
        if args.ftdvcoa_path and cfg.coarse_train.N_iters > 0:
            from fourk_nerf_tpu.models import dvgo

            coarse_ckpt_path = args.ftdvcoa_path
            xyz_min, xyz_max = trainer.compute_bbox_by_coarse_geo(
                dvgo, coarse_ckpt_path, cfg.fine_model_and_render.bbox_thres
            )
            print(f"ftdvcoa_path: bbox tightened to {xyz_min} .. {xyz_max}")
        (model_mod, model_cfg, params, buffers, sr_model, sr_params
         ) = sr_trainer.scene_rep_reconstruction_sr_patch(
            args, cfg, cfg.fine_model_and_render, cfg.fine_train,
            xyz_min, xyz_max, data_dict, stage="fine", writer=writer,
            coarse_ckpt_path=coarse_ckpt_path,
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

    if args.render_video:
        # 4K fly-through: render the spiral path, SR each frame, write mp4
        # (reference run_sr.py:1399-1463 incl. per-frame sr-time printout)
        import time

        import jax
        from fourk_nerf_tpu.models import sr_esrnet
        from fourk_nerf_tpu.ops import rays as ray_ops
        from fourk_nerf_tpu.utils.metrics import to8b

        outdir = os.path.join(rundir, "render_video_sr")
        os.makedirs(outdir, exist_ok=True)
        rposes = np.asarray(data_dict["render_poses"])
        n_frames = len(rposes)
        res = trainer.render_viewpoints(
            model_mod, model_cfg, params, buffers,
            rposes,
            np.tile(data_dict["HW"][0][None], (n_frames, 1)),
            np.tile(data_dict["Ks"][0][None], (n_frames, 1, 1)),
            cfg=cfg, render_kwargs=render_kwargs,
            render_factor=args.render_video_factor,
            render_video_flipy=args.render_video_flipy,
            render_video_rot90=args.render_video_rot90,
        )
        apply_fn = jax.jit(lambda p, x, c: sr_model.apply({"params": p}, x, c))

        # metric-free fly-through: prefer the fused Pallas decode
        # (ops/pallas_sr.py, bf16; ~1.6x the XLA decode at 4K) when the net
        # matches its fixed RRDB geometry; metrics paths stay f32
        use_fast = [int(sr_model.num_feat) == 64
                    and int(sr_model.num_grow_ch) == 32
                    and int(sr_model.scale) in (1, 2, 4)]

        # decode-variant knobs (measured per-chip via
        # tools/perf/sweep_sr_{tiles,one}.py): FOURK_SR_FUSE_RRDB=1 runs
        # whole RRDBs per kernel launch; FOURK_SR_UPCHAIN selects the
        # upsample-conv form — "dilated" (exact lhs-dilated rewrite,
        # tests/test_s2d.py) measured -9.9% vs "materialized" at fern
        # scale on TPU v5 lite (profile_r4/sr_decode_variants.md) and is
        # the default
        _fuse = os.environ.get("FOURK_SR_FUSE_RRDB") == "1"
        if _fuse:
            # measured dead end: the whole-RRDB fused kernel never returned
            # from its fern-scale Mosaic compile in a 38-min bound, 3/3
            # attempts (profile_r4/sr_decode_variants.md) — a production
            # render would silently hang in the remote compiler
            print("WARNING: FOURK_SR_FUSE_RRDB=1 is a recorded compile-bound "
                  "dead end at production scale (>38 min Mosaic compile, "
                  "profile_r4/sr_decode_variants.md); expect a very long or "
                  "never-finishing first-frame compile. Set "
                  "FOURK_SR_FUSE_RRDB_ACK=1 to proceed anyway.")
            if os.environ.get("FOURK_SR_FUSE_RRDB_ACK") != "1":
                raise SystemExit("refusing FOURK_SR_FUSE_RRDB=1 without "
                                 "FOURK_SR_FUSE_RRDB_ACK=1")
        _upchain = os.environ.get("FOURK_SR_UPCHAIN", "dilated")
        if _upchain not in ("materialized", "dilated"):
            raise SystemExit(f"FOURK_SR_UPCHAIN must be 'materialized' or "
                             f"'dilated', got {_upchain!r}")

        def fast_fn(p, x, c):
            if use_fast[0]:
                try:
                    from fourk_nerf_tpu.ops import pallas_sr
                    return np.asarray(pallas_sr.sftnet_apply_pallas_jit(
                        p, jnp_asarray(x), jnp_asarray(c),
                        scale=int(sr_model.scale),
                        num_block=int(sr_model.num_block),
                        fuse_rrdb=_fuse, upchain=_upchain))
                except Exception as e:
                    print(f"pallas SR decode unavailable "
                          f"({type(e).__name__}); XLA decode")
                    use_fast[0] = False
            return np.asarray(apply_fn(p, x, c))

        import jax.numpy as jnp_mod
        jnp_asarray = jnp_mod.asarray
        num_cond = int(cfg.fine_model_and_render.get("num_cond", 1))
        frames = []
        for fi in range(n_frames):
            feat = res["rgb_features"][fi][None]
            conds = []
            if num_cond in (1, 64):
                conds.append(res["depths"][fi][None, ..., None])
            if num_cond in (63, 64):
                H, W = feat.shape[1:3]
                _, _, vd = ray_ops.get_rays_of_a_view(
                    H, W, data_dict["Ks"][0], rposes[fi][:3, :4], ndc=cfg.data.ndc,
                    inverse_y=cfg.data.inverse_y, flip_x=cfg.data.flip_x, flip_y=cfg.data.flip_y,
                )
                conds.append(np.asarray(ray_ops.positional_encoding(vd, 10))[None])
            cond = np.concatenate(conds, axis=-1)
            t0 = time.time()
            if args.test_tile:
                sr = sr_esrnet.tile_process(
                    apply_fn, sr_params, feat, cond, tile_size=args.test_tile, scale=sr_ratio
                )[0]
            else:
                sr = fast_fn(sr_params, feat, cond)[0]
            sr = np.asarray(sr)
            print(f"sr time is: {time.time() - t0:.3f}s (frame {fi + 1}/{n_frames})")
            frames.append(np.clip(sr, 0, 1))
        try:
            import imageio.v2 as imageio

            imageio.mimwrite(
                os.path.join(outdir, "video.sr.mp4"), to8b(np.stack(frames)), fps=30, quality=8
            )
            print(f"wrote {outdir}/video.sr.mp4")
        except Exception as e:
            import imageio.v2 as imageio

            for fi, fr in enumerate(frames):
                imageio.imwrite(os.path.join(outdir, f"sr_{fi:03d}.png"), to8b(fr))
            print(f"mp4 writer unavailable ({e}); wrote PNG frames")

    writer.close()
    print("done")


if __name__ == "__main__":
    main()

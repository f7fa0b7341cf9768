#!/usr/bin/env python3
"""End-to-end 4K pipeline benchmark on the current accelerator.

Measures the full 4K-NeRF inference path at the LLFF fern configuration:
a 1008x756 DirectMPIGO encoder render (384x384x256 grid, 9-ch features,
256 samples/ray, plane-aligned fast path) followed by the x4 SFTNet
VC-Decoder to 4032x3024 (> 4K), as one 4K frame.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is against the BASELINE.json north star of 1 fps at 4K per
chip (so 2.0 means 2x the target).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

# anchor asset preference: the round-5 fern-slice distillation (trained AT
# fern geometry with the headline's viewbase_pe=0 cfg class, so the anchor
# exercises the exact production Pallas path) over the round-3 med-LLFF
# checkpoint (viewbase_pe=4; its wider viewdir embedding VMEM-constrains
# tile choices -- the round-4 anchor incident)
_ASSET_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tools", "assets")
_TRAINED_CKPTS = [os.path.join(_ASSET_DIR, "fern_sr_grids_f16.npz"),
                  os.path.join(_ASSET_DIR, "med_sr_grids_f16.npz")]
_TRAINED_CKPT = next((p for p in _TRAINED_CKPTS if os.path.exists(p)),
                     _TRAINED_CKPTS[-1])


def load_trained_fern_scale():
    """Trained-content anchor (VERDICT round-2 item 5): the committed
    med-LLFF joint checkpoint's encoder grids (tools/dev/med_llff_sr_cfg.py,
    curves in profile_r3/curves_med/) trilinearly upsampled onto the EXACT
    fern benchmark geometry (same bounds/world_size as the synthetic
    headline, so the two timings differ only in grid CONTENT), occupancy
    re-derived.  The synthetic-grid headline uses random density + a 50%
    random mask; a TRAINED grid is sparse and front-loaded, which changes
    early-termination behavior -- this reports both."""
    import jax
    import jax.numpy as jnp

    from fourk_nerf_tpu.models import dmpigo
    from fourk_nerf_tpu.ops import grid_sample

    if not os.path.exists(_TRAINED_CKPT):
        return None
    z = np.load(_TRAINED_CKPT)
    rgbnet = {k[len("rgbnet_"):]: jnp.asarray(z[k], jnp.float32)
              for k in z.files if k.startswith("rgbnet_")}
    cfg = dmpigo.make_config(
        xyz_min=[-1.5, -1.67, -1.0], xyz_max=[1.5, 1.67, 1.0],
        num_voxels=384 * 384 * 256, mpi_depth=256,
        fast_color_thres=1.0 / 256 / 5, rgbnet_dim=int(z["k0"].shape[-1]),
        rgbnet_depth=len(rgbnet) // 2,
        rgbnet_width=int(rgbnet["w1"].shape[0]),
        viewbase_pe=int(z["viewbase_pe"]), spatial_pe=int(z["spatial_pe"]))
    X, Y, Z = cfg.world_size
    params, buffers = dmpigo.init(cfg, jax.random.PRNGKey(0))
    # Slab-chunked jitted upsample: the round-3 bench dispatched this eagerly
    # on fern-scale grids and RESOURCE_EXHAUSTED'd the 16 GB chip (VERDICT r3
    # weak #1).  One jitted slab bounds peak memory to ~0.2 GB.
    up = lambda g: grid_sample.resize_trilinear_chunked(
        jnp.asarray(g, jnp.float32), (X, Y, Z))
    params = {"density": up(z["density"]), "k0": up(z["k0"]),
              "rgbnet": rgbnet}
    occupancy_update = jax.jit(
        lambda p, b: dmpigo.update_occupancy_cache(cfg, p, b))
    buffers = occupancy_update(params, buffers)
    return cfg, params, buffers


def _startup_watchdog(seconds: float = 300.0):
    """Fail FAST if backend init hangs: a SIGKILLed client can wedge the
    tunneled TPU's claim for hours, after which ``jax.devices()`` blocks
    uninterruptibly (see memory/axon-tunnel-perf).  Dying with a clear
    message beats silently eating the caller's whole timeout."""
    import threading

    done = threading.Event()

    def check():
        if not done.wait(seconds):
            print(f"# bench: backend did not initialize within {seconds:.0f}s "
                  "(tunneled TPU claim wedged?); aborting", flush=True)
            os._exit(3)

    threading.Thread(target=check, daemon=True).start()
    return done


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="run the on-chip Pallas parity gate first "
                         "(tools/perf/parity_on_chip.py)")
    args = ap.parse_args()

    wd = _startup_watchdog()
    import jax as _jax
    _jax.devices()
    wd.set()
    if args.check:
        import sys
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "tools", "perf"))
        import parity_on_chip
        parity_on_chip.main()

    import jax
    import jax.numpy as jnp

    from fourk_nerf_tpu.models import dmpigo, sr_esrnet
    from fourk_nerf_tpu.ops import rays as ray_ops

    H, W = 756, 1008  # LLFF fern LR (configs/llff/llff_default_lg.py:8-9)
    sr_scale = 4
    rng = np.random.default_rng(0)

    cfg = dmpigo.make_config(
        xyz_min=[-1.5, -1.67, -1.0], xyz_max=[1.5, 1.67, 1.0],
        num_voxels=384 * 384 * 256, mpi_depth=256,
        fast_color_thres=1.0 / 256 / 5, rgbnet_dim=9, rgbnet_depth=3, rgbnet_width=64,
    )
    params, buffers = dmpigo.init(cfg, jax.random.PRNGKey(0))
    params["density"] = jnp.asarray(
        rng.normal(-2.0, 2.0, params["density"].shape).astype(np.float32)
    )
    buffers["mask_cache"] = jnp.asarray(rng.uniform(size=cfg.mask_cache_world_size) < 0.5)

    # one real camera's NDC rays for the full frame
    focal = 815.0
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]], dtype=np.float32)
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 1.0
    ro, rd, vd = ray_ops.get_rays_of_a_view(
        H, W, K, c2w[:3, :4], ndc=True, inverse_y=False, flip_x=False, flip_y=False
    )
    ro = jnp.asarray(np.asarray(ro).reshape(-1, 3))
    rd = jnp.asarray(np.asarray(rd).reshape(-1, 3))
    vd = jnp.asarray(np.asarray(vd).reshape(-1, 3))

    chunk = 65536
    n = ro.shape[0]
    pad = (-n) % chunk
    ro = jnp.concatenate([ro, ro[-pad:]], 0) if pad else ro
    rd = jnp.concatenate([rd, rd[-pad:]], 0) if pad else rd
    vd = jnp.concatenate([vd, vd[-pad:]], 0) if pad else vd
    n_chunks = ro.shape[0] // chunk
    ndc_planes = dmpigo.plane_aligned_ok(cfg, 1.0, ndc=True)

    @jax.jit
    def encoder_chunk(params, buffers, ro, rd, vd):
        out = dmpigo.forward(
            cfg, params, buffers, ro, rd, vd, stepsize=1.0, bg=1.0,
            render_depth=True, ndc_planes=ndc_planes,
        )
        return out["rgb_feature"], out["depth"]

    from fourk_nerf_tpu.ops import pallas_sweep, plane_sweep

    use_pallas = [bool(ndc_planes)]

    def encode_frame():
        if use_pallas[0]:
            # production metric-free path: fused Pallas sweep-tile kernel
            # (VMEM-resident interp+mask+MLP+transmittance, per-tile early
            # plane termination)
            try:
                out = pallas_sweep.render_frame_pallas(
                    cfg, params, buffers, H, W, K, c2w[:3, :4], stepsize=1.0,
                    bg=1.0, tile=None, patch=None, use_bf16=True,
                    early_exit=True,
                )
                return (out["rgb_feature"][None], out["depth"][None, ..., None])
            except Exception as e:
                print(f"# pallas unavailable ({type(e).__name__}: "
                      f"{str(e)[:500]}); XLA sweep")
                use_pallas[0] = False
        if ndc_planes:
            out = plane_sweep.render_frame(
                cfg, params, buffers, H, W, K, c2w[:3, :4], stepsize=1.0, bg=1.0,
                tile=32, patch=48,
            )
            return (out["rgb_feature"][None], out["depth"][None, ..., None])
        feats, depths = [], []
        for i in range(n_chunks):
            s = i * chunk
            f, d = encoder_chunk(params, buffers, ro[s:s + chunk], rd[s:s + chunk],
                                 vd[s:s + chunk])
            feats.append(f)
            depths.append(d)
        feat = jnp.concatenate(feats, 0)[:n].reshape(1, H, W, 3)
        depth = jnp.concatenate(depths, 0)[:n].reshape(1, H, W, 1)
        return feat, depth

    # SR decoder
    sr_model = sr_esrnet.SFTNet(n_in_colors=3, scale=sr_scale, num_feat=64,
                                num_block=5, num_grow_ch=32, num_cond=1)
    sr_params = sr_model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 1))
    )["params"]

    from fourk_nerf_tpu.ops import pallas_sr

    @jax.jit
    def sr_xla(p, x, c):
        # bf16 decode: ~2x MXU conv throughput; accuracy quantified in
        # tests/test_sr.py (sub-1e-2 absolute on [0,1] images)
        return sr_esrnet.apply_bf16(sr_model, p, x, c)

    # Decode variant knobs.  FOURK_SR_FUSE_RRDB / FOURK_SR_UPCHAIN are the
    # same surface run_sr.py's video path reads; FOURK_SR_TILE is bench-only
    # (run_sr.py uses the production default tile).  Defaults are the measured
    # winners from tools/perf/sweep_sr_{tiles,one}.py on TPU v5 lite
    # (profile_r4/sr_decode_variants.md: dilated upchain -9.9% vs
    # materialized) — override to re-measure alternatives.  All three
    # validate eagerly so a typo'd sweep setting fails fast instead of
    # silently re-measuring the default (ADVICE r3).
    _fuse = os.environ.get("FOURK_SR_FUSE_RRDB", "0") == "1"
    _upchain = os.environ.get("FOURK_SR_UPCHAIN", "dilated")
    if _upchain not in ("materialized", "dilated"):
        raise SystemExit(f"FOURK_SR_UPCHAIN must be 'materialized' or "
                         f"'dilated', got {_upchain!r}")
    _tile = os.environ.get("FOURK_SR_TILE", "48x128")
    try:
        _th, _tw = (int(v) for v in _tile.split("x"))
    except ValueError:
        raise SystemExit(f"FOURK_SR_TILE must be '<th>x<tw>', got {_tile!r}")
    if _th % 8 != 0 or _tw % 16 != 0:
        raise SystemExit(f"FOURK_SR_TILE {_tile!r}: th must be a multiple of "
                         "8 and tw a multiple of 16 (Pallas sublane/lane "
                         "tiling)")

    @jax.jit
    def sr_pallas(p, x, c):
        # fused dense-block decode: VMEM-resident RRDB body (ops/pallas_sr.py)
        return pallas_sr.sftnet_apply_pallas(p, x, c, scale=sr_scale,
                                             num_block=5, th=_th, tw=_tw,
                                             fuse_rrdb=_fuse, upchain=_upchain)

    use_sr_pallas = [True]

    def sr_full(p, x, c):
        if use_sr_pallas[0]:
            try:
                return sr_pallas(p, x, c)
            except Exception as e:
                print(f"# pallas SR unavailable ({type(e).__name__}: "
                      f"{str(e)[:500]}); XLA decode")
                use_sr_pallas[0] = False
        return sr_xla(p, x, c)

    def one_frame():
        feat, depth = encode_frame()
        return sr_full(sr_params, feat, depth)

    # warmup (compiles)
    jax.block_until_ready(one_frame())

    def sync(x):
        # 1-element fetch forces completion of the whole program; on a
        # tunneled remote backend block_until_ready under-reports and a full
        # np.asarray pulls MBs at ~2MB/s
        return float(x.reshape(-1)[0])

    ts, ts_enc = [], []
    for _ in range(5):
        t0 = time.perf_counter()
        feat, depth = encode_frame()
        sync(feat)
        t1 = time.perf_counter()
        sr = sr_full(sr_params, feat, depth)
        sync(sr)
        ts_enc.append(t1 - t0)
        ts.append(time.perf_counter() - t0)
    frame_s = float(np.median(ts))
    enc_s = float(np.median(ts_enc))
    fps = 1.0 / frame_s
    # snapshot the HEADLINE's paths NOW: the round-4 capture computed these
    # after the trained anchor ran, and an anchor-only Pallas failure
    # (VMEM overflow on its wider viewbase_pe=4 cfg) flipped the shared
    # flag and mislabeled the measured-on-Pallas headline as "xla-sweep"
    # (VERDICT r4 weak #1/#2 shared root cause, tools/perf/diag_r5.py)
    enc_path = "pallas-sweep" if use_pallas[0] else (
        "xla-sweep" if ndc_planes else "xla-chunked")
    sr_path = (f"pallas tile={_th}x{_tw}"
               f"{' fuse-rrdb' if _fuse else ''}"
               f"{' dilated-up' if _upchain == 'dilated' else ''}"
               if use_sr_pallas[0] else "xla bf16")

    # trained-content anchor: same pipeline, same camera, encoder grids from
    # the committed med-LLFF joint checkpoint upsampled to fern resolution.
    # The WHOLE anchor block is fail-soft (VERDICT r3 weak #1: an anchor
    # failure must never destroy the already-measured synthetic headline).
    trained_note = "no trained anchor"
    trained_fps = None
    anchor_path = None
    try:
        anchor = load_trained_fern_scale()
        if anchor is not None:
            tcfg, tparams, tbuffers = anchor

            # the anchor's fallback state is its OWN: its cfg differs from
            # the headline's (viewbase_pe=4/spatial_pe=2 from the med
            # checkpoint), so a Pallas failure here says nothing about the
            # headline path -- and must never relabel it (round-4 bug)
            use_pallas_anchor = [use_pallas[0]]

            def encode_trained():
                if use_pallas_anchor[0]:
                    try:
                        out = pallas_sweep.render_frame_pallas(
                            tcfg, tparams, tbuffers, H, W, K, c2w[:3, :4],
                            stepsize=1.0, bg=1.0, tile=None, patch=None,
                            use_bf16=True, early_exit=True)
                        return out["rgb_feature"][None], out["depth"][None, ..., None]
                    except Exception as e:
                        print(f"# anchor pallas unavailable ({type(e).__name__}: "
                              f"{str(e)[:500]}); XLA sweep")
                        use_pallas_anchor[0] = False
                out = plane_sweep.render_frame(
                    tcfg, tparams, tbuffers, H, W, K, c2w[:3, :4], stepsize=1.0,
                    bg=1.0, tile=32, patch=48)
                return out["rgb_feature"][None], out["depth"][None, ..., None]

            feat, depth = encode_trained()
            jax.block_until_ready(sr_full(sr_params, feat, depth))  # warmup
            t_ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                feat, depth = encode_trained()
                sync(feat)
                sync(sr_full(sr_params, feat, depth))
                t_ts.append(time.perf_counter() - t0)
            trained_fps = 1.0 / float(np.median(t_ts))
            anchor_path = ("pallas-sweep" if use_pallas_anchor[0]
                           else "xla-sweep")
            trained_note = (f"trained-anchor {trained_fps:.3f} fps "
                            f"[{anchor_path}]")
    except Exception as e:
        trained_note = f"trained-anchor failed: {type(e).__name__}"
        print(f"# trained anchor failed ({type(e).__name__}: {e}); "
              "headline unaffected")

    print(json.dumps({
        "metric": "4k_pipeline_frames_per_sec",
        "value": round(fps, 3),
        "unit": "frames/s (1008x756 encoder + x4 SFTNet; encoder "
                f"{enc_s*1e3:.1f} ms [{enc_path}], "
                f"sr {1e3*(frame_s-enc_s):.1f} ms [{sr_path}]; "
                f"{trained_note})",
        "vs_baseline": round(fps / 1.0, 3),
        # machine-checkable path/timing fields (VERDICT r4 item 7): the
        # driver and judge must not have to regex the unit string
        "enc_path": enc_path,
        "sr_path": sr_path,
        "enc_ms": round(enc_s * 1e3, 1),
        "sr_ms": round((frame_s - enc_s) * 1e3, 1),
        "trained_anchor_fps": (round(trained_fps, 3)
                               if trained_fps is not None else None),
        "anchor_path": anchor_path,
    }))


if __name__ == "__main__":
    main()

"""Bounded-scene (lego-class) brick-sweep frame benchmark on the live chip.

Scene mirrors nerf_synthetic/lego fine-stage scale: 160^3 grid, rgbnet 12/128,
stepsize 0.5, 800x800 frames; occupancy = a central blob (~lego-like fill).

Usage: python tools/perf/bench_box.py [--tile 16] [--block 4] [--frames 3]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile", type=int, default=16)
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--hw", type=int, default=800)
    ap.add_argument("--grid", type=int, default=160)
    ap.add_argument("--fill", type=float, default=0.15)
    ap.add_argument("--bf16", type=int, default=1)
    ap.add_argument("--chunked", action="store_true",
                    help="also time the chunked-gather path (slow!)")
    ap.add_argument("--pallas", action="store_true",
                    help="use the fused Pallas slab kernel (ops/pallas_box)")
    ap.add_argument("--parity", action="store_true",
                    help="f32 Pallas kernel vs f32 XLA sweep on this chip")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fourk_nerf_tpu.models import dvgo
    from fourk_nerf_tpu.ops import box_sweep

    G = args.grid
    cfg = dvgo.make_config(
        xyz_min=[-1.2, -1.2, -1.2], xyz_max=[1.2, 1.2, 1.2],
        num_voxels=G**3, num_voxels_base=G**3, alpha_init=1e-6,
        rgbnet_dim=12, rgbnet_width=128, rgbnet_depth=3,
        fast_color_thres=1e-4,
    )
    print("world:", cfg.world_size, "K:", cfg.n_samples(0.5))
    rng = np.random.default_rng(0)
    params, buffers = dvgo.init(cfg, jax.random.PRNGKey(0))
    X, Y, Z = cfg.world_size
    gx, gy, gz = np.meshgrid(np.linspace(-1, 1, X), np.linspace(-1, 1, Y),
                             np.linspace(-1, 1, Z), indexing="ij")
    r2 = gx**2 + gy**2 + gz**2
    blob = r2 < (3.0 * args.fill / (4.0 * np.pi) * 8.0) ** (2 / 3)
    # density: solid-ish inside the blob (alpha ~0.5 at act_shift(1e-6)),
    # empty outside -- rays saturate a few samples into the surface like a
    # trained opaque scene
    dens = np.where(blob, rng.normal(15.0, 5.0, blob.shape), -6.0)
    params["density"] = jnp.asarray(dens[..., None].astype(np.float32))
    params["k0"] = jnp.asarray(
        rng.normal(0, 1, params["k0"].shape).astype(np.float32))
    buffers["mask_cache"] = jnp.asarray(blob)
    print(f"occupancy fill: {blob.mean():.3f}")

    H = W = args.hw
    f = 0.9 * W
    Kc = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)

    def pose(ang):
        ax, ay = 0.5, ang
        Rx = np.array([[1, 0, 0], [0, np.cos(ax), -np.sin(ax)],
                       [0, np.sin(ax), np.cos(ax)]])
        Ry = np.array([[np.cos(ay), 0, np.sin(ay)], [0, 1, 0],
                       [-np.sin(ay), 0, np.cos(ay)]])
        R = (Ry @ Rx).astype(np.float32)
        c2w = np.eye(4, dtype=np.float32)[:3, :4]
        c2w[:3, :3] = R
        # -z-forward: camera at +4 along its own z looks back at the origin
        c2w[:3, 3] = R @ np.array([0, 0, 4.0], np.float32)
        return c2w

    if args.pallas:
        from fourk_nerf_tpu.ops import pallas_box

    def run(c2w, timers=None, use_bf16=None):
        ub = bool(args.bf16) if use_bf16 is None else use_bf16
        fn = (pallas_box.render_frame_box_pallas if args.pallas
              else box_sweep.render_frame_box)
        out = fn(cfg, params, buffers, H, W, Kc, c2w, stepsize=0.5, near=0.2,
                 bg=1.0, use_bf16=ub, tile=args.tile, timers=timers)
        # 1-element fetch forces completion without pulling the frame
        return float(np.asarray(out["rgb_marched"][0, 0, 0])), out

    t0 = time.time()
    run(pose(0.0))
    print(f"first frame (compile): {time.time() - t0:.1f}s")
    times = []
    for i in range(args.frames):
        c2w = pose(0.1 + 0.2 * i)
        t0 = time.time()
        run(c2w)
        dt = time.time() - t0
        times.append(dt)
        print(f"frame {i}: {dt * 1000:.0f} ms")
    print(f"box sweep: median {np.median(times) * 1000:.0f} ms/frame "
          f"(tile={args.tile} bf16={args.bf16})")
    tm = {}
    run(pose(0.33), timers=tm)
    ts = {k: v[0] for k, v in tm.items() if k != "plan"}
    print("plan:", tm.get("plan"))
    print({k: f"{(ts[k] - ts[p]) * 1000:.0f} ms" for k, p in
           (("prep", "t0"), ("sweep", "prep")) if k in ts and p in ts})

    if args.parity:
        from fourk_nerf_tpu.ops import pallas_box as pb
        c2w = pose(0.27)
        a = pb.render_frame_box_pallas(
            cfg, params, buffers, H, W, Kc, c2w, stepsize=0.5, near=0.2,
            bg=1.0, use_bf16=False, tile=args.tile)
        b = box_sweep.render_frame_box(
            cfg, params, buffers, H, W, Kc, c2w, stepsize=0.5, near=0.2,
            bg=1.0, use_bf16=False, tile=args.tile)
        err = float(np.abs(np.asarray(a["rgb_marched"])
                           - np.asarray(b["rgb_marched"])).max())
        print(f"on-chip f32 parity kernel-vs-XLA: max|err| {err:.2e}")
        assert err < 5e-4, err

    if args.chunked:
        from fourk_nerf_tpu.ops import rays as ray_ops

        fwd = jax.jit(lambda ro, rd, vd: dvgo.forward(
            cfg, params, buffers, ro, rd, vd, stepsize=0.5, near=0.2,
            far=1e9, bg=1.0)["rgb_marched"])
        ro, rd, vd = ray_ops.get_rays_of_a_view(
            H, W, Kc, pose(0.1), ndc=False, inverse_y=False, flip_x=False,
            flip_y=False)
        flat = lambda x: jnp.asarray(np.asarray(x).reshape(-1, 3))
        ro, rd, vd = flat(ro), flat(rd), flat(vd)
        chunk = 8192
        t0 = time.time()
        outs = []
        for s in range(0, ro.shape[0], chunk):
            outs.append(fwd(ro[s:s + chunk], rd[s:s + chunk], vd[s:s + chunk]))
        float(np.asarray(outs[-1][0, 0]))
        print(f"chunked gathers: {time.time() - t0:.1f} s/frame")


if __name__ == "__main__":
    main()

"""Encoder training driver: the TPU-native ``scene_rep_reconstruction``.

Mirrors the structure and semantics of /root/reference/run.py:335-633 --
coarse->fine direct voxel optimization with progressive grid scaling,
occupancy-cache renewal, per-voxel lr, TV regularization and MaskedAdam --
re-architected around jitted phase functions: shapes are static within a
progressive-scaling phase, so each phase gets one compiled train step; a
pg_scale boundary re-jits (the reference likewise rebuilds its optimizer
there, run.py:465-476).
"""

from __future__ import annotations

import functools
import os
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from fourk_nerf_tpu.models import dcvgo, dmpigo, dvgo
from fourk_nerf_tpu.ops import rays as ray_ops
from fourk_nerf_tpu.train import checkpoints, losses, optim
from fourk_nerf_tpu.utils import metrics, misc, stats as stats_mod


# ---------------------------------------------------------------------------
# bbox estimation (run.py:209-278)
# ---------------------------------------------------------------------------

def compute_bbox_by_cam_frustrm(cfg, HW, Ks, poses, i_train, near, far,
                                near_clip=None):
    """Scene bbox from the training camera frusta (run.py:207-254).

    Unbounded-inward scenes get the reference's separate rule
    (_compute_bbox_by_cam_frustrm_unbounded, run.py:223-239): the tightest
    cube covering all near_clip points, scaled by unbounded_inner_r --
    contraction handles everything outside it."""
    if cfg.data.get("unbounded_inward", False):
        return _compute_bbox_unbounded(
            cfg, HW, Ks, poses, i_train,
            near if near_clip is None else near_clip)
    xyz_min = np.full(3, np.inf)
    xyz_max = -xyz_min
    for i in i_train:
        H, W = HW[i]
        rays_o, rays_d, viewdirs = ray_ops.get_rays_of_a_view(
            int(H), int(W), Ks[i], poses[i], ndc=cfg.data.ndc,
            inverse_y=cfg.data.inverse_y, flip_x=cfg.data.flip_x, flip_y=cfg.data.flip_y,
        )
        if cfg.data.ndc:
            pts_nf = np.stack([np.asarray(rays_o + rays_d * near), np.asarray(rays_o + rays_d * far)])
        else:
            pts_nf = np.stack(
                [np.asarray(rays_o + viewdirs * near), np.asarray(rays_o + viewdirs * far)]
            )
        xyz_min = np.minimum(xyz_min, pts_nf.reshape(-1, 3).min(0))
        xyz_max = np.maximum(xyz_max, pts_nf.reshape(-1, 3).max(0))
    return xyz_min, xyz_max


def _compute_bbox_unbounded(cfg, HW, Ks, poses, i_train, near_clip):
    xyz_min = np.full(3, np.inf)
    xyz_max = -xyz_min
    for i in i_train:
        H, W = HW[i]
        rays_o, rays_d, _ = ray_ops.get_rays_of_a_view(
            int(H), int(W), Ks[i], poses[i], ndc=cfg.data.ndc,
            inverse_y=cfg.data.inverse_y, flip_x=cfg.data.flip_x,
            flip_y=cfg.data.flip_y,
        )
        pts = np.asarray(rays_o + rays_d * float(near_clip)).reshape(-1, 3)
        xyz_min = np.minimum(xyz_min, pts.min(0))
        xyz_max = np.maximum(xyz_max, pts.max(0))
    center = (xyz_min + xyz_max) * 0.5
    radius = float((center - xyz_min).max()) * float(
        cfg.data.get("unbounded_inner_r", 1.0))
    return center - radius, center + radius


def compute_bbox_by_coarse_geo(model_mod, ckpt_path, thres):
    """Tighten the bbox to voxels whose coarse alpha exceeds ``thres``
    (run.py:257-278)."""
    kwargs, params, buffers, *_ = checkpoints.load_checkpoint(ckpt_path)
    cfg = model_mod.make_config(**kwargs)
    from fourk_nerf_tpu.ops import render as render_ops

    xyz = np.stack(
        np.meshgrid(
            *[np.linspace(cfg.xyz_min[d], cfg.xyz_max[d], cfg.world_size[d]) for d in range(3)],
            indexing="ij",
        ),
        -1,
    )
    from fourk_nerf_tpu.ops import grid_sample

    density = grid_sample.grid_query(
        jnp.asarray(params["density"]), jnp.asarray(xyz, dtype=jnp.float32),
        jnp.asarray(cfg.xyz_min), jnp.asarray(cfg.xyz_max),
    )[..., 0]
    shift = cfg.act_shift if hasattr(cfg, "act_shift") else 0.0
    alpha = np.asarray(render_ops.raw2alpha(density, shift, cfg.voxel_size_ratio))
    mask = alpha > thres
    if not mask.any():
        # degenerate coarse geometry (e.g. very short runs): keep the full box
        print("compute_bbox_by_coarse_geo: no voxel above threshold; keeping full bbox")
        return np.asarray(cfg.xyz_min), np.asarray(cfg.xyz_max)
    active = xyz[mask]
    return active.min(0), active.max(0)


# ---------------------------------------------------------------------------
# training-ray gathering (run.py:400-433, lib/dvgo.py:585-758)
# ---------------------------------------------------------------------------

def gather_training_rays(cfg, cfg_train, data_dict, model_mod=None, model_state=None,
                         render_kwargs=None):
    """Returns dict with per-mode ray storage + a host-side batch sampler."""
    HW, Ks, poses = data_dict["HW"], data_dict["Ks"], data_dict["poses"]
    i_train = data_dict["i_train"]
    images = data_dict["images"]

    ray_lists = {"rgb": [], "rays_o": [], "rays_d": [], "viewdirs": []}
    for i in i_train:
        H, W = int(HW[i][0]), int(HW[i][1])
        ro, rd, vd = ray_ops.get_rays_of_a_view(
            H, W, Ks[i], poses[i], ndc=cfg.data.ndc, inverse_y=cfg.data.inverse_y,
            flip_x=cfg.data.flip_x, flip_y=cfg.data.flip_y,
        )
        img = np.asarray(images[i], dtype=np.float32)
        ray_lists["rgb"].append(img)
        ray_lists["rays_o"].append(np.asarray(ro))
        ray_lists["rays_d"].append(np.asarray(rd))
        ray_lists["viewdirs"].append(np.asarray(vd))

    sampler = cfg_train.ray_sampler
    if sampler == "in_maskcache":
        # filter rays by coarse-geometry hits (lib/dvgo.py:643-680)
        cfg_m, params, buffers = model_state
        hit_fn = jax.jit(
            lambda ro, rd: model_mod.hit_coarse_geo(
                cfg_m, buffers, ro, rd,
                near=render_kwargs["near"], far=render_kwargs["far"],
                stepsize=render_kwargs["stepsize"],
            )
        )
        kept = {k: [] for k in ray_lists}
        for v in range(len(ray_lists["rgb"])):
            ro = ray_lists["rays_o"][v].reshape(-1, 3)
            rd = ray_lists["rays_d"][v].reshape(-1, 3)
            mask_chunks = []
            for s in range(0, ro.shape[0], 65536):
                mask_chunks.append(np.asarray(hit_fn(jnp.asarray(ro[s:s + 65536]),
                                                     jnp.asarray(rd[s:s + 65536]))))
            mask = np.concatenate(mask_chunks)
            for k in kept:
                flat = ray_lists[k][v].reshape(-1, ray_lists[k][v].shape[-1])
                kept[k].append(flat[mask])
        flat = {k: np.concatenate(v, 0) for k, v in kept.items()}
        mode = "flat"
    elif sampler == "flatten":
        flat = {k: np.concatenate([a.reshape(-1, a.shape[-1]) for a in v], 0)
                for k, v in ray_lists.items()}
        mode = "flat"
    elif sampler in ("random", "patch_simg", "patch_mimg", "patch_inmask",
                     "patch_box"):
        flat = {k: np.stack(v, 0) for k, v in ray_lists.items()}  # [V,H,W,3]
        mode = "image"
        if (sampler == "patch_inmask" and model_state is not None
                and hasattr(model_mod, "hit_coarse_geo")):
            # per-view coarse-geometry hit maps for patch filtering
            # (/root/reference/lib/dvgo.py:786-820: patches whose rays all
            # miss the occupancy cache are dropped from the rotation).
            # Host-side, startup-only; stored under the reserved "_hit" key
            # the trainer pops before device upload.
            cfg_m, params, buffers = model_state
            hit_fn = jax.jit(
                lambda ro, rd: model_mod.hit_coarse_geo(
                    cfg_m, buffers, ro, rd,
                    near=render_kwargs["near"], far=render_kwargs["far"],
                    stepsize=render_kwargs["stepsize"],
                )
            )
            hits = []
            for v in range(len(ray_lists["rgb"])):
                H, W = ray_lists["rays_o"][v].shape[:2]
                ro = ray_lists["rays_o"][v].reshape(-1, 3)
                rd = ray_lists["rays_d"][v].reshape(-1, 3)
                chunks = [np.asarray(hit_fn(jnp.asarray(ro[s:s + 65536]),
                                            jnp.asarray(rd[s:s + 65536])))
                          for s in range(0, ro.shape[0], 65536)]
                hits.append(np.concatenate(chunks).reshape(H, W))
            flat["_hit"] = np.stack(hits, 0)  # [V,H,W] bool
    else:
        raise NotImplementedError(sampler)

    return flat, mode, ray_lists


def make_batch_sampler(sampler: str, flat: dict, n_rand: int, seed: int,
                       hit: np.ndarray | None = None):
    """Host-side index sampler matching the reference's samplers
    (lib/dvgo.py:761-819).

    Takes the 0-based draw count ``step`` so that resuming from a checkpoint
    replays the identical batch stream (the epoch permutation is a pure
    function of ``(seed, epoch)``) -- this is what makes checkpoint resume
    bit-exact (reference restores optimizer state, lib/utils.py:53-59; its
    batch stream is not resume-stable, ours is)."""
    if sampler in ("flatten", "in_maskcache"):
        n = flat["rgb"].shape[0]
        bpe = max(n // n_rand, 1)  # rollover when top + n_rand > n
        cache = {"epoch": -1, "perm": None}

        def sample(step: int):
            epoch, i = divmod(step, bpe)
            if cache["epoch"] != epoch:
                cache["epoch"] = epoch
                cache["perm"] = np.random.default_rng((seed, epoch)).permutation(n)
            idx = cache["perm"][i * n_rand:(i + 1) * n_rand]
            return ("flat", idx)

        return sample
    if sampler == "random":
        V, H, W = flat["rgb"].shape[:3]

        def sample(step: int):
            rng = np.random.default_rng((seed, step))
            return (
                "pix",
                (
                    rng.integers(0, V, n_rand),
                    rng.integers(0, H, n_rand),
                    rng.integers(0, W, n_rand),
                ),
            )

        return sample
    if sampler == "patch_box":
        # coherent pixel patches for the slab-sweep bounded train path
        # (ops/box_sweep.py::sweep_rays_train_box): grid-aligned origins
        # clamped to the border (same scheme as the joint trainer's patch
        # sampler, quantified in tests/test_patch_weighting.py), shuffled
        # over (view x position), patch side = largest multiple of 8 with
        # P^2 <= N_rand
        V, H, W = flat["rgb"].shape[:3]
        P = max((int(np.sqrt(n_rand)) // 8) * 8, 8)
        rows = sorted({min(r, H - P) for r in range(0, H, P)})
        cols = sorted({min(c, W - P) for c in range(0, W, P)})
        combos = [(v, r, c) for v in range(V) for r in rows for c in cols]
        cache = {"epoch": -1, "order": None}

        def sample(step: int):
            epoch, i = divmod(step, len(combos))
            if cache["epoch"] != epoch:
                cache["epoch"] = epoch
                cache["order"] = np.random.default_rng(
                    (seed, epoch)).permutation(len(combos))
            return ("patch", combos[cache["order"][i]])

        sample.patch = P
        return sample
    if sampler in ("patch_simg", "patch_mimg", "patch_inmask"):
        # Encoder-side coherent-patch samplers. The reference tiles each
        # image into (N_rand//64)-sided patches plus ragged edge strips
        # (/root/reference/lib/dvgo.py:786-878). We use the same
        # grid-aligned-origins-clamped-to-border scheme as the joint SR
        # sampler (static square patches -> one jit compile; the edge
        # re-weighting deviation is quantified in
        # tests/test_patch_weighting.py). NOTE the reference's OWN run.py
        # consumers of patch_simg/patch_mimg are dead code: the generators
        # yield 2 and 6 values while run.py:485-496 unpacks exactly 3, so
        # the working semantics mirrored here are run_sr.py:822-843's.
        V, H, W = flat["rgb"].shape[:3]
        P = max((min(n_rand // 64, H, W) // 8) * 8, 8)
        rows = sorted({min(r, H - P) for r in range(0, H, P)})
        cols = sorted({min(c, W - P) for c in range(0, W, P)})
        pos = [(r, c) for r in rows for c in cols]
        if sampler == "patch_simg":
            # 'single image': exhaust one view's patches (shuffled) before
            # advancing to the next view (lib/dvgo.py:822-848 tiles a single
            # image and yields no view index).
            def sample(step: int):
                block, i = divmod(step, len(pos))
                rng = np.random.default_rng((seed, block))
                r, c = pos[rng.permutation(len(pos))[i]]
                return ("patch", (block % V, r, c))
        else:
            # 'multi image' / 'inmask': shuffle over (view x position);
            # inmask drops patches whose rays all miss the coarse occupancy
            # cache (lib/dvgo.py:786-820 keeps patches with >2048 hits; we
            # keep any-hit, the same criterion the SR trainer uses).
            combos = [(v, r, c) for v in range(V) for (r, c) in pos]
            if sampler == "patch_inmask" and hit is not None:
                kept = [(v, r, c) for (v, r, c) in combos
                        if hit[v][r:r + P, c:c + P].any()]
                if kept:  # never filter down to nothing
                    combos = kept
            cache = {"epoch": -1, "order": None}

            def sample(step: int):
                epoch, i = divmod(step, len(combos))
                if cache["epoch"] != epoch:
                    cache["epoch"] = epoch
                    cache["order"] = np.random.default_rng(
                        (seed, epoch)).permutation(len(combos))
                return ("patch", combos[cache["order"][i]])

        sample.patch = P
        return sample
    raise NotImplementedError(sampler)


def compute_box_plans(model_cfg, ray_lists, render_kwargs, patch: int):
    """Host-side static plan for the ``patch_box`` slab-sweep train path:
    per-view (axis, flip, S) + one global (Pu, Pv) window covering every
    sampler patch of every view.  Returns (plans, (Pu, Pv)) or (None, None)
    when some view lacks a dominant axis / the window would be too wide —
    the trainer then falls back to the gather forward on the same
    patches."""
    from fourk_nerf_tpu.ops import box_sweep

    stepsize, near = render_kwargs["stepsize"], render_kwargs["near"]
    plans, Pu, Pv = [], 8, 8
    u_cap, v_cap = max(model_cfg.world_size), max(model_cfg.world_size)
    for v in range(len(ray_lists["rays_o"])):
        ro, rd = ray_lists["rays_o"][v], ray_lists["rays_d"][v]
        vd = ray_lists["viewdirs"][v]
        plan = box_sweep.box_train_plan(model_cfg, ro, rd,
                                        stepsize=stepsize, near=near)
        if plan is None:
            return None, None
        H, W = ro.shape[:2]
        rows = sorted({min(r, H - patch) for r in range(0, H, patch)})
        cols = sorted({min(c, W - patch) for c in range(0, W, patch)})
        tiles = lambda x: np.stack(
            [x[r:r + patch, c:c + patch].reshape(-1, 3)
             for r in rows for c in cols])
        pupv = box_sweep.box_window_size_for(
            model_cfg, tiles(ro), tiles(rd), tiles(vd),
            stepsize=stepsize, near=near, axis=plan[0], flip=plan[1])
        if pupv is None:
            return None, None
        plans.append(plan)
        Pu, Pv = max(Pu, pupv[0]), max(Pv, pupv[1])
        # the shared window must fit the minor-axis extents of EVERY
        # view's plan (views can sweep different axes)
        ax = plan[0]
        u_cap = min(u_cap, model_cfg.world_size[(ax + 1) % 3])
        v_cap = min(v_cap, model_cfg.world_size[(ax + 2) % 3])
    return plans, (min(Pu, u_cap), min(Pv, v_cap))


def make_box_train_steps(model_mod, model_cfg, cfg_train, *, render_kwargs,
                         skip_zero_grad, Pu: int, Pv: int, near_thres=None):
    """Factory of jitted ``patch_box`` train steps, cached per static
    (axis, flip, S) plan (different views can sweep different axes; at
    most ~6 distinct compiles per stage)."""
    from fourk_nerf_tpu.ops import box_sweep

    cache: dict = {}

    def get_step(axis: int, flip: bool, S: int):
        key = (axis, flip, S)
        if key not in cache:
            def box_forward(cfg_, p, buffers_, ro, rd, vd, *, stepsize,
                            near, bg, rand_bkgd, is_train, key, **_unused):
                return box_sweep.sweep_rays_train_box(
                    cfg_, p, buffers_, ro, rd, vd, stepsize=stepsize,
                    near=near, bg=bg, axis=axis, flip=flip, S=S, Pu=Pu,
                    Pv=Pv, key=key, rand_bkgd=rand_bkgd, is_train=is_train)
            cache[key] = make_train_step(
                model_mod, model_cfg, cfg_train, render_kwargs=render_kwargs,
                skip_zero_grad=skip_zero_grad, near_thres=near_thres,
                forward_fn=box_forward)
        return cache[key]

    return get_step


# ---------------------------------------------------------------------------
# the jitted train step
# ---------------------------------------------------------------------------

def make_train_step(model_mod, model_cfg, cfg_train, *, render_kwargs: dict,
                    skip_zero_grad: frozenset, near_thres=None,
                    donate: bool = True, forward_fn=None):
    """Build a jitted step fn. Static per phase: model config (shapes),
    TV-mode flags. Traced: params, opt state, batch, lrs, rng key.

    ``forward_fn`` overrides the rendering forward (same signature subset
    as ``model_mod.forward``) — used by the bounded slab-sweep train path
    (ops/box_sweep.py::sweep_rays_train_box), which binds its static
    (axis, flip, S, Pu, Pv) plan in a closure."""

    weight_tv_density = float(cfg_train.weight_tv_density)
    weight_tv_k0 = float(cfg_train.weight_tv_k0)
    rk = {k: render_kwargs[k] for k in ("near", "far", "bg", "stepsize")}
    rand_bkgd = bool(render_kwargs.get("rand_bkgd", False))
    ndc_planes = bool(render_kwargs.get("ndc_planes", False))

    # Donate params + optimizer state: without donation the old and new
    # state are simultaneously live during the step, DOUBLING the grid
    # memory footprint -- at fern scale (384x384x256 grids + Adam moments
    # ~4.5 GB) that OOMs a 16 GB chip. Donation invalidates the passed-in
    # arrays on EVERY backend (including CPU on this JAX version); callers
    # must not reuse the passed state after stepping (the training loops
    # reassign it) -- tests/dryruns that reuse state build with donate=False.
    @functools.partial(jax.jit, static_argnames=("apply_tv", "tv_dense"),
                       donate_argnums=(0, 2) if donate else ())
    def train_step(params, buffers, opt_state, batch, lrs, per_lr, key, *,
                   apply_tv: bool, tv_dense: bool):
        rays_o, rays_d, viewdirs, target = batch
        n_rays = rays_o.shape[0]

        def loss_fn(p):
            out = (forward_fn or model_mod.forward)(
                model_cfg, p, buffers, rays_o, rays_d, viewdirs,
                stepsize=rk["stepsize"], near=rk["near"], far=rk["far"],
                bg=rk["bg"], rand_bkgd=rand_bkgd, is_train=True, key=key,
                ndc_planes=ndc_planes,
            )
            loss, terms = losses.encoder_losses(
                out, target, cfg_train, n_rays, near_thres=near_thres
            )
            # VQ models EMA-update their codebook during the training forward
            # (reference lib/grid.py:38-103, in-place); thread it out as aux
            return loss, (terms, out.get("vq_state"))

        (loss, (terms, vq_state)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)

        if apply_tv:
            if weight_tv_density > 0 and "density" in grads:
                grads = {**grads, "density": grads["density"] + model_mod.density_tv_grad(
                    model_cfg, params, weight_tv_density, tv_dense, n_rays, grads["density"]
                )}
            # VQ models have no k0 grid (reference VQGrid has no TV op either)
            if weight_tv_k0 > 0 and "k0" in grads:
                grads = {**grads, "k0": grads["k0"] + model_mod.k0_tv_grad(
                    model_cfg, params, weight_tv_k0, tv_dense, n_rays, grads["k0"]
                )}

        new_params, new_opt_state = optim.apply_updates(
            params, grads, opt_state, lrs, skip_zero_grad=skip_zero_grad, per_lr=per_lr
        )
        psnr = -10.0 * jnp.log10(terms["mse"] / max(cfg_train.weight_main, 1e-12))
        return new_params, new_opt_state, loss, psnr, vq_state

    # jax.profiler trace annotation on the hot step (training_stats-style
    # observability, torch_utils/misc.py:102-108 analogue)
    return misc.profiled_function(train_step)


# ---------------------------------------------------------------------------
# rendering / eval (run.py:66-171)
# ---------------------------------------------------------------------------

def cfg_box_ok(model_cfg) -> bool:
    """True when the bounded brick sweep (ops/box_sweep.py) can serve this
    model: dense grids, explicit rgb."""
    return (getattr(model_cfg, "density_type", "") == "DenseGrid"
            and getattr(model_cfg, "k0_type", "") == "DenseGrid"
            and not getattr(model_cfg, "rgbnet_full_implicit", False))


def render_viewpoints(model_mod, model_cfg, params, buffers, render_poses, HW, Ks, *,
                      cfg, render_kwargs, gt_imgs=None, chunk: int = 8192,
                      eval_ssim=True, eval_lpips_vgg=False, eval_lpips_alex=False,
                      render_factor=0, render_video_flipy=False,
                      render_video_rot90=0, verbose=True):
    """Chunked full-frame rendering + metrics. Returns dict of stacked
    outputs and per-frame metric lists.

    ``render_factor``: downscale resolution+intrinsics for fast previews and
    skip metrics (reference run.py:75-79,133). ``render_video_flipy`` /
    ``render_video_rot90``: post-render frame flip/rotation
    (reference run.py:149-159)."""
    if render_factor:
        HW = (np.asarray(HW, dtype=np.float64) / render_factor).astype(int)
        Ks = np.copy(np.asarray(Ks))
        Ks[:, :2, :3] = Ks[:, :2, :3] / render_factor
        gt_imgs = None  # reference skips metrics at render_factor != 0
    rk = dict(render_kwargs)
    rk.pop("rand_bkgd", None)
    if model_mod is dmpigo and "ndc_planes" not in rk:
        rk["ndc_planes"] = dmpigo.plane_aligned_ok(model_cfg, rk["stepsize"], cfg.data.ndc)

    # gather-free plane-sweep full-frame path (ops/plane_sweep.py) when the
    # NDC plane-alignment conditions hold -- ~15x faster than chunked gathers
    use_sweep = bool(rk.get("ndc_planes")) and model_mod is dmpigo and "rgbnet" in params
    # bounded-scene brick sweep (ops/box_sweep.py): replaces the reference's
    # fused CUDA chain for the dvgo family (render_utils_kernel.cu:144-242)
    use_box = (model_mod is dvgo and cfg_box_ok(model_cfg)
               and not cfg.data.ndc)

    pallas_ok = [True]  # sticky: stop retrying after the first failure

    def sweep_frame(H, W, K_i, c2w):
        from fourk_nerf_tpu.ops import pallas_sweep, plane_sweep

        if gt_imgs is None and pallas_ok[0]:
            # metric-free rendering (videos, previews): the fused Pallas
            # sweep-tile kernel with per-tile early plane termination.
            # Rectangular tiles (short pixel-y, wide pixel-x): the kernel's
            # VPU-bound y-contraction scales with the per-plane y window,
            # which auto-sizes from the measured footprint (patch=None).
            try:
                return pallas_sweep.render_frame_pallas(
                    model_cfg, params, buffers, H, W, K_i, c2w,
                    stepsize=rk["stepsize"], bg=rk["bg"], tile=None,
                    patch=None,
                    inverse_y=cfg.data.inverse_y, flip_x=cfg.data.flip_x,
                    flip_y=cfg.data.flip_y, use_bf16=True,
                )
            except Exception as e:  # fall back to the XLA sweep
                pallas_ok[0] = False
                print(f"pallas sweep unavailable ({type(e).__name__}: {e}); "
                      "using XLA sweep")
        tp = plane_sweep.auto_tile_patch(
            model_cfg, H, W, K_i, c2w,
            inverse_y=cfg.data.inverse_y, flip_x=cfg.data.flip_x, flip_y=cfg.data.flip_y,
        )
        if tp is None:
            raise ValueError("no (tile, patch) fits this camera's footprint")
        tile, patch = tp
        # published metrics (gt present) are computed with the f32 sweep --
        # bf16 is a speed knob for metric-free rendering only
        return plane_sweep.render_frame(
            model_cfg, params, buffers, H, W, K_i, c2w,
            stepsize=rk["stepsize"], bg=rk["bg"], tile=tile, patch=patch,
            inverse_y=cfg.data.inverse_y, flip_x=cfg.data.flip_x, flip_y=cfg.data.flip_y,
            use_bf16=(gt_imgs is None),
        )

    box_pallas_ok = [True]  # sticky: stop retrying after the first failure

    def box_frame(H, W, K_i, c2w):
        from fourk_nerf_tpu.ops import box_sweep, pallas_box

        # metrics (gt present) computed with the f32 sweep; bf16 is the
        # metric-free speed mode (same policy as the NDC sweep)
        kw = dict(stepsize=rk["stepsize"], near=rk["near"], bg=rk["bg"],
                  inverse_y=cfg.data.inverse_y, flip_x=cfg.data.flip_x,
                  flip_y=cfg.data.flip_y, use_bf16=(gt_imgs is None))
        if gt_imgs is None and box_pallas_ok[0]:
            # metric-free rendering: the fused Pallas slab kernel with
            # occupancy-interval + saturation skipping (~2x the XLA sweep)
            try:
                return pallas_box.render_frame_box_pallas(
                    model_cfg, params, buffers, H, W, K_i, c2w, **kw)
            except ValueError as e:
                if "dominant axis" in str(e):
                    raise  # per-frame guard; the XLA sweep refuses too
                # kernel-only limits (native-res mask, window size): the
                # XLA sweep still applies -- stop retrying the kernel
                box_pallas_ok[0] = False
                print(f"pallas box kernel unavailable ({e}); XLA slab sweep")
            except Exception as e:  # Mosaic/layout trouble: XLA sweep
                box_pallas_ok[0] = False
                print(f"pallas box kernel unavailable ({type(e).__name__}: "
                      f"{e}); using XLA slab sweep")
        return box_sweep.render_frame_box(
            model_cfg, params, buffers, H, W, K_i, c2w, **kw)

    @jax.jit
    def fwd(ro, rd, vd):
        # metrics path: force true-f32 MXU passes (TPU default is bf16-grade)
        with jax.default_matmul_precision("highest"):
            out = model_mod.forward(
                model_cfg, params, buffers, ro, rd, vd,
                stepsize=rk["stepsize"], near=rk["near"], far=rk["far"], bg=rk["bg"],
                render_depth=True, ndc_planes=bool(rk.get("ndc_planes", False)),
            )
        return {k: out[k] for k in ("rgb_marched", "rgb_feature", "depth", "alphainv_last")}

    rgbs, feats, depths, bgmaps = [], [], [], []
    psnrs, ssims, lpips_vgg, lpips_alex, frame_times = [], [], [], [], []

    def add_metrics(rgb, fi):
        gt = np.asarray(gt_imgs[fi])
        psnrs.append(metrics.psnr(rgb, gt))
        if eval_ssim:
            ssims.append(metrics.rgb_ssim(rgb, gt))
        if eval_lpips_vgg:
            lp = metrics.rgb_lpips(gt, rgb, "vgg")
            if lp is not None:
                lpips_vgg.append(lp)
        if eval_lpips_alex:
            lp = metrics.rgb_lpips(gt, rgb, "alex")
            if lp is not None:
                lpips_alex.append(lp)

    for fi, c2w in enumerate(render_poses):
        H, W = int(HW[fi][0]), int(HW[fi][1])
        if use_sweep or use_box:
            try:
                t0 = time.time()
                if use_box:
                    out_f = box_frame(H, W, Ks[fi], c2w[:3, :4])
                else:
                    out_f = sweep_frame(H, W, Ks[fi], c2w[:3, :4])
                rgb = np.asarray(out_f["rgb_marched"])
                frame_times.append(time.time() - t0)
                rgbs.append(rgb)
                feats.append(np.asarray(out_f["rgb_feature"]))
                depths.append(np.asarray(out_f["depth"]))
                bgmaps.append(np.asarray(out_f["alphainv_last"]))
                if gt_imgs is not None:
                    add_metrics(rgb, fi)
                continue
            except ValueError as e:  # footprint guard: fall back to gathers
                print(f"render_viewpoints: sweep unavailable ({e}); chunked path")
                use_sweep = use_box = False
        ro, rd, vd = ray_ops.get_rays_of_a_view(
            H, W, Ks[fi], c2w[:3, :4], ndc=cfg.data.ndc, inverse_y=cfg.data.inverse_y,
            flip_x=cfg.data.flip_x, flip_y=cfg.data.flip_y,
        )
        ro = np.asarray(ro).reshape(-1, 3)
        rd = np.asarray(rd).reshape(-1, 3)
        vd = np.asarray(vd).reshape(-1, 3)
        n = ro.shape[0]
        pad = (-n) % chunk
        if pad:
            ro = np.concatenate([ro, ro[-1:].repeat(pad, 0)], 0)
            rd = np.concatenate([rd, rd[-1:].repeat(pad, 0)], 0)
            vd = np.concatenate([vd, vd[-1:].repeat(pad, 0)], 0)
        t0 = time.time()
        outs = []
        for s in range(0, ro.shape[0], chunk):
            outs.append(fwd(jnp.asarray(ro[s:s + chunk]), jnp.asarray(rd[s:s + chunk]),
                            jnp.asarray(vd[s:s + chunk])))
        out = {k: np.concatenate([np.asarray(o[k]) for o in outs], 0)[:n] for k in outs[0]}
        jax.block_until_ready(outs[-1]["rgb_marched"])
        frame_times.append(time.time() - t0)
        rgb = out["rgb_marched"].reshape(H, W, -1)
        rgbs.append(rgb)
        feats.append(out["rgb_feature"].reshape(H, W, -1))
        depths.append(out["depth"].reshape(H, W))
        bgmaps.append(out["alphainv_last"].reshape(H, W))
        if gt_imgs is not None:
            add_metrics(rgb, fi)
    if verbose and psnrs:
        print(f"render_viewpoints: psnr {np.mean(psnrs):.2f}"
              + (f" ssim {np.mean(ssims):.4f}" if ssims else "")
              + (f" lpips(vgg) {np.mean(lpips_vgg):.4f}" if lpips_vgg else "")
              + (f" lpips(alex) {np.mean(lpips_alex):.4f}" if lpips_alex else ""))
    if render_video_flipy:  # reference run.py:149-153
        rgbs = [np.flip(x, axis=0) for x in rgbs]
        feats = [np.flip(x, axis=0) for x in feats]
        depths = [np.flip(x, axis=0) for x in depths]
        bgmaps = [np.flip(x, axis=0) for x in bgmaps]
    if render_video_rot90 != 0:  # reference run.py:155-159
        k = int(render_video_rot90)
        rgbs = [np.rot90(x, k=k, axes=(0, 1)) for x in rgbs]
        feats = [np.rot90(x, k=k, axes=(0, 1)) for x in feats]
        depths = [np.rot90(x, k=k, axes=(0, 1)) for x in depths]
        bgmaps = [np.rot90(x, k=k, axes=(0, 1)) for x in bgmaps]
    return {
        "rgbs": np.stack(rgbs), "rgb_features": np.stack(feats),
        "depths": np.stack(depths), "bgmaps": np.stack(bgmaps),
        "psnrs": psnrs, "ssims": ssims, "lpips_vgg": lpips_vgg,
        "lpips_alex": lpips_alex, "frame_times": frame_times,
    }


# ---------------------------------------------------------------------------
# scene reconstruction: one stage (coarse or fine)
# ---------------------------------------------------------------------------

def scene_rep_reconstruction(args, cfg, cfg_model, cfg_train, xyz_min, xyz_max,
                             data_dict, stage: str, coarse_ckpt_path: str | None = None,
                             writer=None):
    """Train one stage. Returns (model_mod, model_cfg, params, buffers)."""
    if abs(cfg_model.world_bound_scale - 1) > 1e-9:
        xyz_shift = (xyz_max - xyz_min) * (cfg_model.world_bound_scale - 1) / 2
        xyz_min = xyz_min - xyz_shift
        xyz_max = xyz_max + xyz_shift

    HW, Ks, poses = data_dict["HW"], data_dict["Ks"], data_dict["poses"]
    near, far = data_dict["near"], data_dict["far"]
    i_train = data_dict["i_train"]
    seed = int(getattr(args, "seed", 777))
    key = jax.random.PRNGKey(seed)
    step_key_base = jax.random.fold_in(jax.random.PRNGKey(seed), 0x5EED)

    last_ckpt_path = os.path.join(cfg.basedir, cfg.expname, f"{stage}_last.npz")

    # --- model construction / reload (run.py:280-332) -----------------------
    model_mod = _select_model_mod(cfg)
    model_kwargs = {k: v for k, v in cfg_model.items()}
    num_voxels = model_kwargs.pop("num_voxels")
    if len(cfg_train.pg_scale):
        num_voxels = int(num_voxels / (2 ** len(cfg_train.pg_scale)))

    reload_path = None
    if not getattr(args, "no_reload", False):
        if getattr(args, "ft_path", ""):
            reload_path = args.ft_path
        elif os.path.isfile(last_ckpt_path):
            reload_path = last_ckpt_path
        else:
            # killed run: resume from the newest periodic i_weights ckpt
            import glob
            cands = [p for p in glob.glob(os.path.join(
                cfg.basedir, cfg.expname, f"{stage}_*.npz"))
                if p != last_ckpt_path and "_last" not in os.path.basename(p)
                and not p.endswith(".tmp.npz")]  # kill mid-write leaves tmps
            if cands:
                reload_path = max(cands)

    start = 0
    opt_state_l = None
    meta_l: dict = {}
    if reload_path is None:
        init_mask = None
        if (not cfg.data.ndc) and coarse_ckpt_path:
            mask, m_min, m_max = (
                checkpoints.mask_from_coarse_torch_checkpoint(
                    coarse_ckpt_path, cfg_model.mask_cache_thres
                )
                if coarse_ckpt_path.endswith(".tar")
                else checkpoints.mask_from_coarse_checkpoint(
                    coarse_ckpt_path, cfg_model.mask_cache_thres
                )
            )
            # resample the coarse mask onto this stage's grid via nearest lookup
            from fourk_nerf_tpu.ops import grid_sample as gs

            model_cfg = _make_cfg(model_mod, cfg, xyz_min, xyz_max, num_voxels, model_kwargs)
            xyz = np.stack(
                np.meshgrid(
                    *[np.linspace(model_cfg.xyz_min[d], model_cfg.xyz_max[d],
                                  model_cfg.mask_cache_world_size[d]) for d in range(3)],
                    indexing="ij",
                ), -1,
            )
            init_mask = np.asarray(gs.nearest_mask_lookup(
                jnp.asarray(mask), jnp.asarray(xyz, dtype=jnp.float32),
                jnp.asarray(m_min, dtype=jnp.float32), jnp.asarray(m_max, dtype=jnp.float32),
            ))
        else:
            model_cfg = _make_cfg(model_mod, cfg, xyz_min, xyz_max, num_voxels, model_kwargs)
        key, k_init = jax.random.split(key)
        params, buffers = model_mod.init(model_cfg, k_init, init_mask=init_mask)
        # only DirectVoxGO implements near-camera voxel maskout (reference
        # lib/dvgo.py:187; run.py:364 would AttributeError on other models)
        if cfg_model.maskout_near_cam_vox and model_mod is dvgo:
            params = dvgo.maskout_near_cam_vox(
                model_cfg, params, poses[i_train, :3, 3], near
            )
    else:
        print(f"scene_rep_reconstruction ({stage}): reload from {reload_path}")
        if reload_path.endswith(".tar"):  # reference torch checkpoint
            kwargs_l, params, buffers, start = checkpoints.import_torch_encoder_checkpoint(
                reload_path
            )
        else:
            kwargs_l, params, buffers, opt_state_l, start, meta_l = checkpoints.load_checkpoint(
                reload_path
            )
        model_cfg = model_mod.make_config(**kwargs_l)

    render_kwargs = {
        "near": float(near), "far": float(far),
        "bg": 1.0 if cfg.data.white_bkgd else 0.0,
        "rand_bkgd": bool(cfg.data.rand_bkgd),
        "stepsize": float(cfg_model.stepsize),
    }
    if model_mod is dmpigo:
        render_kwargs["ndc_planes"] = dmpigo.plane_aligned_ok(
            model_cfg, render_kwargs["stepsize"], cfg.data.ndc
        )

    # --- rays + sampler -----------------------------------------------------
    flat, mode, ray_lists = gather_training_rays(
        cfg, cfg_train, data_dict,
        model_mod=model_mod, model_state=(model_cfg, params, buffers),
        render_kwargs=render_kwargs,
    )
    hit = flat.pop("_hit", None)
    sample_batch = make_batch_sampler(cfg_train.ray_sampler, flat, cfg_train.N_rand,
                                      seed, hit=hit)

    dev_flat = {k: jnp.asarray(v) for k, v in flat.items()}

    # --- per-voxel lr (run.py:438-446) -------------------------------------
    per_lr = None
    if cfg_train.pervoxel_lr:
        cnt = dvgo.voxel_count_views(
            model_cfg, ray_lists["rays_o"], ray_lists["rays_d"], None, near, far,
            cfg_model.stepsize, downrate=cfg_train.pervoxel_lr_downrate,
        )
        per_lr = {"density": cnt / jnp.maximum(cnt.max(), 1.0)}
        mask = np.asarray(buffers["mask_cache"])
        cnt_np = np.asarray(cnt)[..., 0]
        if cnt_np.shape == mask.shape:
            mask = mask & ~(cnt_np <= 2)
            buffers = {**buffers, "mask_cache": jnp.asarray(mask)}

    if cfg_train.get("maskout_lt_nviews", 0) > 0 and model_mod is dmpigo:
        buffers = dmpigo.update_occupancy_cache_lt_nviews(
            model_cfg, buffers, ray_lists["rays_o"], ray_lists["rays_d"],
            cfg_model.stepsize, cfg_train.maskout_lt_nviews,
        )

    # --- optimizer + jitted step -------------------------------------------
    base_lrs = optim.build_group_lrs(cfg_train, params)
    skip_zero = frozenset(cfg_train.skip_zero_grad_fields)
    opt_state = optim.init_state({k: params[k] for k in params})
    if not getattr(args, "no_reload_optimizer", False):
        opt_state, restored = optim.restore_state(opt_state_l, opt_state)
        if restored:
            print(f"scene_rep_reconstruction ({stage}): restored optimizer state")
    near_thres = None
    if model_mod is dcvgo and data_dict.get("near_clip") is not None:
        near_thres = float(data_dict["near_clip"]) / model_cfg.scene_radius[0]
    train_step = make_train_step(
        model_mod, model_cfg, cfg_train, render_kwargs=render_kwargs,
        skip_zero_grad=skip_zero, near_thres=near_thres,
    )

    # patch_box: slab-sweep bounded train path (static per-view plans; the
    # gather forward serves as fallback when no dominant axis exists)
    box_plans, box_step_for = None, None

    def setup_box_steps(mcfg):
        plans, pupv = compute_box_plans(mcfg, ray_lists, render_kwargs,
                                        sample_batch.patch)
        if plans is None:
            print(f"scene_rep_reconstruction ({stage}): patch_box -> gather "
                  f"fallback (no dominant axis / window too wide)")
            return None, None
        print(f"scene_rep_reconstruction ({stage}): patch_box slab-sweep ON "
              f"(window {pupv}, plans {sorted(set(plans))})")
        return plans, make_box_train_steps(
            model_mod, mcfg, cfg_train, render_kwargs=render_kwargs,
            skip_zero_grad=skip_zero, Pu=pupv[0], Pv=pupv[1],
            near_thres=near_thres)

    if cfg_train.ray_sampler == "patch_box" and model_mod is dvgo:
        box_plans, box_step_for = setup_box_steps(model_cfg)

    # lr-decay clock: restored from the checkpoint (it resets at pg_scale
    # boundaries, so plain ``start`` is wrong after the first boundary)
    if "steps_since_reset" in meta_l:
        steps_since_reset = int(meta_l["steps_since_reset"])
    else:
        prior = [b for b in cfg_train.pg_scale if b <= start]
        steps_since_reset = start - (max(prior) if prior else 0)
    collector = stats_mod.Collector()  # training_stats-style moment collector
    best_val_psnr = -1.0
    time0 = time.time()

    gather_flat = jax.jit(lambda d, idx: tuple(d[k][idx] for k in ("rays_o", "rays_d", "viewdirs", "rgb")))
    gather_pix = jax.jit(
        lambda d, b, r, c: tuple(d[k][b, r, c] for k in ("rays_o", "rays_d", "viewdirs", "rgb"))
    )
    _pp = getattr(sample_batch, "patch", 8)
    gather_patch = jax.jit(
        lambda d, v, r, c: tuple(
            jax.lax.dynamic_slice(d[k][v], (r, c, 0), (_pp, _pp, 3))
            .reshape(-1, 3)
            for k in ("rays_o", "rays_d", "viewdirs", "rgb"))
    )

    for global_step in range(1 + start, 1 + cfg_train.N_iters):
        # occupancy renewal (run.py:461-462)
        if (global_step + 500) % 1000 == 0:
            buffers = model_mod.update_occupancy_cache(model_cfg, params, buffers)

        # progressive scaling (run.py:465-476)
        if global_step in cfg_train.pg_scale:
            n_rest = len(cfg_train.pg_scale) - cfg_train.pg_scale.index(global_step) - 1
            cur_voxels = int(cfg_model.num_voxels / (2**n_rest))
            if model_mod is dmpigo:
                model_cfg, params, buffers = dmpigo.scale_volume_grid(
                    model_cfg, params, buffers, cur_voxels, model_cfg.mpi_depth
                )
                buffers = dmpigo.decay_act_shift(buffers, cfg_train.decay_after_scale)
            else:
                model_cfg, params, buffers = model_mod.scale_volume_grid(
                    model_cfg, params, buffers, cur_voxels
                )
            opt_state = optim.init_state({k: params[k] for k in params})
            steps_since_reset = 0
            train_step = make_train_step(
                model_mod, model_cfg, cfg_train, render_kwargs=render_kwargs,
                skip_zero_grad=skip_zero, near_thres=near_thres,
            )
            if box_step_for is not None:
                # voxel_size halved: S and the slab window change
                box_plans, box_step_for = setup_box_steps(model_cfg)

        # batch (run.py:479-506); indexed by step so resume replays the stream
        kind, sel = sample_batch(global_step - 1)
        step_fn = train_step
        if kind == "flat":
            rays_o, rays_d, viewdirs, target = gather_flat(dev_flat, jnp.asarray(sel))
        elif kind == "patch":
            v, r, c = sel
            rays_o, rays_d, viewdirs, target = gather_patch(
                dev_flat, jnp.asarray(v), jnp.asarray(r), jnp.asarray(c)
            )
            if box_step_for is not None:
                step_fn = box_step_for(*box_plans[v])
        else:
            b, r, c = sel
            rays_o, rays_d, viewdirs, target = gather_pix(
                dev_flat, jnp.asarray(b), jnp.asarray(r), jnp.asarray(c)
            )

        lrs = {
            k: optim.group_lr(v, steps_since_reset, cfg_train.lrate_decay)
            for k, v in base_lrs.items()
        }
        # per-step key derived from the global step (not a consumed stream)
        # so a resumed run draws identical randomness
        k_step = jax.random.fold_in(step_key_base, global_step)
        apply_tv = (
            global_step < cfg_train.tv_before
            and global_step > cfg_train.tv_after
            and global_step % cfg_train.tv_every == 0
        )
        params, opt_state, loss, psnr, vq_state = step_fn(
            params, buffers, opt_state, (rays_o, rays_d, viewdirs, target), lrs, per_lr,
            k_step, apply_tv=bool(apply_tv), tv_dense=bool(global_step < cfg_train.tv_dense_before),
        )
        if vq_state is not None:  # EMA codebook learning (DirectQVGO)
            buffers = {**buffers, "vq_state": vq_state}
        steps_since_reset += 1
        collector.report("train/loss", stats_mod.moments(loss))
        collector.report("train/psnr", stats_mod.moments(psnr))

        if args.i_print and global_step % args.i_print == 0:
            eps = time.time() - time0
            print(
                f"scene_rep_reconstruction ({stage}): iter {global_step:6d} / "
                f"Loss: {collector.mean('train/loss'):.9f} / "
                f"PSNR: {collector.mean('train/psnr'):5.2f} / "
                f"Eps: {eps:.0f}s"
            )
            if writer is not None:
                for name, st in collector.as_dict().items():
                    writer.scalar(name, st.mean, global_step)
            collector.reset()

        if args.i_val and global_step % args.i_val == 0 and len(data_dict["i_val"]):
            res = render_viewpoints(
                model_mod, model_cfg, params, buffers,
                poses[data_dict["i_val"]], HW[data_dict["i_val"]], Ks[data_dict["i_val"]],
                cfg=cfg, render_kwargs=render_kwargs,
                gt_imgs=[np.asarray(data_dict["images"][i]) for i in data_dict["i_val"]],
            )
            val_psnr = float(np.mean(res["psnrs"]))
            if writer is not None:
                writer.scalar("val/psnr", val_psnr, global_step)
                if res["ssims"]:
                    writer.scalar("val/ssim", float(np.mean(res["ssims"])), global_step)
            if val_psnr > best_val_psnr:
                best_val_psnr = val_psnr
                checkpoints.save_checkpoint(
                    os.path.join(cfg.basedir, cfg.expname, "best_psnr.npz"),
                    model_mod.get_kwargs(model_cfg), params, buffers,
                    global_step=global_step, async_save=True,
                )

        if args.i_weights and global_step % args.i_weights == 0:
            # async: device-side snapshot, pull+write on a worker thread
            # (see checkpoints.save_checkpoint) -- a fern-scale grid tree is
            # GBs and a synchronous pull would stall training
            checkpoints.save_checkpoint(
                os.path.join(cfg.basedir, cfg.expname, f"{stage}_{global_step:06d}.npz"),
                model_mod.get_kwargs(model_cfg), params, buffers, opt_state, global_step,
                extra_meta={"steps_since_reset": steps_since_reset},
                async_save=True,
            )

    if cfg_train.N_iters > 0:
        checkpoints.wait_for_pending_saves()
        checkpoints.save_checkpoint(
            last_ckpt_path, model_mod.get_kwargs(model_cfg), params, buffers,
            opt_state, cfg_train.N_iters,
            extra_meta={"steps_since_reset": steps_since_reset},
        )
        print(f"scene_rep_reconstruction ({stage}): saved checkpoint at {last_ckpt_path}")

    return model_mod, model_cfg, params, buffers


def _select_model_mod(cfg):
    """Model-class switch (run.py:286-313): ndc -> DirectMPIGO (or DirectQVGO
    when mode_type == 'adain_vq'), unbounded_inward -> DirectContractedVoxGO,
    else DirectVoxGO."""
    if cfg.data.ndc:
        if cfg.fine_model_and_render.get("mode_type") == "adain_vq":
            from fourk_nerf_tpu.models import dvqgo

            return dvqgo
        return dmpigo
    if cfg.data.get("unbounded_inward", False):
        return dcvgo
    return dvgo


def _make_cfg(model_mod, cfg, xyz_min, xyz_max, num_voxels, model_kwargs):
    kw = dict(model_kwargs)
    if model_mod is dmpigo or getattr(model_mod, "__name__", "").endswith("dvqgo"):
        # MPI-family models (DirectMPIGO and its VQ variant) take mpi_depth
        return model_mod.make_config(
            xyz_min=xyz_min, xyz_max=xyz_max, num_voxels=num_voxels,
            mpi_depth=kw.pop("mpi_depth"), **kw,
        )
    kw.pop("mpi_depth", None)
    return model_mod.make_config(
        xyz_min=xyz_min, xyz_max=xyz_max, num_voxels=num_voxels,
        num_voxels_base=kw.pop("num_voxels_base"), alpha_init=kw.pop("alpha_init"), **kw,
    )


def train(args, cfg, data_dict, writer=None):
    """Full coarse->fine pipeline (run.py:636-685)."""
    os.makedirs(os.path.join(cfg.basedir, cfg.expname), exist_ok=True)
    xyz_min, xyz_max = compute_bbox_by_cam_frustrm(
        cfg, data_dict["HW"], data_dict["Ks"], data_dict["poses"], data_dict["i_train"],
        data_dict["near"], data_dict["far"], near_clip=data_dict.get("near_clip"),
    )
    coarse_ckpt_path = None
    if cfg.coarse_train.N_iters > 0:
        scene_rep_reconstruction(
            args, cfg, cfg.coarse_model_and_render, cfg.coarse_train,
            xyz_min, xyz_max, data_dict, stage="coarse", writer=writer,
        )
        coarse_ckpt_path = os.path.join(cfg.basedir, cfg.expname, "coarse_last.npz")
        model_mod = dmpigo if cfg.data.ndc else dvgo
        xyz_min, xyz_max = compute_bbox_by_coarse_geo(
            model_mod, coarse_ckpt_path, cfg.fine_model_and_render.bbox_thres
        )
    return scene_rep_reconstruction(
        args, cfg, cfg.fine_model_and_render, cfg.fine_train,
        xyz_min, xyz_max, data_dict, stage="fine",
        coarse_ckpt_path=coarse_ckpt_path, writer=writer,
    )

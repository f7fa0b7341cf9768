"""Gather-free plane-sweep renderer for the NDC MPI model.

XLA scalarizes random voxel gathers on TPU (~15 ns/element, measured ~24k
rays/s on the fern-scale model), so the full-frame render path avoids
gathers entirely:

- Rays are processed in square pixel tiles. In NDC, a ray's grid-space xy
  position is AFFINE in the plane index k (``pos(k) = a + b*k``), so a
  tile's footprint on depth plane k is a small patch whose origin moves
  smoothly with k -- fetched with one ``dynamic_slice`` per (tile, k).
- Bilinear interpolation inside the patch is expressed as two separable
  hat-weight contractions: ``wx[r, p] = relu(1 - |pos_x[r] - p|)`` has
  exactly the two nonzero bilinear taps per row, so
  ``out = wy . (wx @ patch)`` reproduces trilinear-on-a-plane exactly --
  as MXU matmuls instead of 4 scalar gathers per sample.
- The per-plane alpha -> transmittance -> composite runs as a
  ``lax.scan`` over k carrying the accumulated transmittance, so the whole
  renderer is (dynamic_slice + matmul + VPU) -- no gathers anywhere.

Numerics: with ``use_bf16=False`` the sweep matches the plane-aligned path of
:func:`fourk_nerf_tpu.models.dmpigo.forward` exactly (zeros padding included:
a position outside the patch support gets zero hat weight; the free-space
mask uses one-hot weights = exact nearest-neighbor maskcache semantics).
With ``use_bf16=True`` (the fast default for metric-free rendering and
training) grids/MLP matmuls run in bfloat16 with f32 accumulation --
quantified in tests/test_plane_sweep.py (grad agreement vs f32) and excluded
from published metric computation (render_viewpoints evaluates in f32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from fourk_nerf_tpu.models import common
from fourk_nerf_tpu.ops import render, rays as ray_ops


def pack_grids(cfg, params, buffers):
    """Pack density + k0 into one plane-major [Z, X, Y, Cp] array (lane-
    friendly channel count), plus per-plane act_shift [Z], plus the
    free-space mask. Two mask modes, both reproducing the reference's
    nearest-neighbor ``maskcache_lookup`` exactly
    (render_utils_kernel.cu:367-424; z is exact because plane-aligned
    samples sit on integer z):

    - CHANNEL mode (mask resolution == grid resolution, the common case):
      the 0/1 mask rides as an extra channel of the packed grid and the
      sweep reads it through the SAME patch slice + x-interpolation matmul
      as the features -- exact nearest semantics come from per-axis
      snapping (one-hot nearest-y selector picks a single 1-D x-bilerp of
      the 0/1 mask; ``floor(.+0.5)`` of that value is the mask at the
      nearest x tap). No separate mask slices/contractions at all.
    - NATIVE mode (resolutions differ): per-plane mask at its native
      resolution ([Z, mX, mY] float); the sweep reads it with snapped
      one-hot hat weights in MASK index space.

    Returns (packed, act_shift, mask_info) with mask_info either
    ("channel", mask_ch_index) or ("native", mask_planes)."""
    density = params["density"]  # [X,Y,Z,1]
    k0 = params["k0"]            # [X,Y,Z,C]
    mask = buffers["mask_cache"]  # [mX, mY, mZ] bool
    channel_mode = tuple(mask.shape) == tuple(density.shape[:3])

    parts = [density, k0]
    if channel_mode:
        parts.append(mask.astype(density.dtype)[..., None])
    packed = jnp.concatenate(parts, axis=-1)  # [X,Y,Z,Cp0]
    cp = packed.shape[-1]
    pad = (-cp) % 8
    if pad:
        packed = jnp.pad(packed, ((0, 0), (0, 0), (0, 0), (0, pad)))
    packed = jnp.transpose(packed, (2, 0, 1, 3))  # [Z,X,Y,Cp]
    act_shift = buffers["act_shift"][0, 0, :, 0]  # [Z]

    if channel_mode:
        return packed, act_shift, ("channel", cp - 1)

    Z = density.shape[2]
    mZ = mask.shape[2]
    if mZ == Z:
        zidx = jnp.arange(Z, dtype=jnp.int32)
    else:  # nearest mask plane for sample plane k (z = k exactly)
        zidx = jnp.round(
            jnp.arange(Z, dtype=jnp.float32) * (mZ - 1) / max(Z - 1, 1)
        ).astype(jnp.int32)
    mask_planes = jnp.transpose(mask, (2, 0, 1))[zidx].astype(jnp.float32)
    return packed, act_shift, ("native", mask_planes)


def mask_scale_and_patch(cfg, mask_shape, patch: int):
    """Static helpers for the in-sweep mask lookup: per-axis index scale
    (world-grid units -> mask-grid units) and the mask patch size needed to
    cover a ``patch``-wide world footprint."""
    X, Y, _ = cfg.world_size
    mX, mY = int(mask_shape[0]), int(mask_shape[1])
    sx = (mX - 1) / max(X - 1, 1)
    sy = (mY - 1) / max(Y - 1, 1)
    pm = int(np.ceil(patch * max(sx, sy))) + 4
    pm = max(int(np.ceil(pm / 8.0) * 8), 8)
    return float(sx), float(sy), min(pm, mX, mY)


def _affine_coeffs(rays_o, rays_d, xyz_min, xyz_max, sizes, n_samples):
    """Grid-space xy position of sample k: pos(k) = a + b * k."""
    a = (rays_o[..., :2] - xyz_min[:2]) / (xyz_max[:2] - xyz_min[:2]) * (sizes - 1)
    b = (rays_d[..., :2] / (xyz_max[:2] - xyz_min[:2])) * (sizes - 1) / (n_samples - 1)
    return a, b


def _hat_weights(pos, offset, P: int):
    """[R] positions -> [R, P] two-tap bilinear weights relative to a patch
    starting at ``offset``."""
    rel = pos[:, None] - (offset + jnp.arange(P, dtype=pos.dtype))[None, :]
    return jnp.maximum(0.0, 1.0 - jnp.abs(rel))


def sweep_all_tiles(packed, act_shift, mask_planes, a_tiles, b_tiles, vd_tiles,
                    mlp_params, *, cfg, interval, patch: int, k0_dim: int,
                    bg: float, act, msx: float, msy: float, mpatch: int,
                    use_bf16: bool = True, mask_ch: int | None = None):
    """Plane-outer sweep: each depth plane is read from HBM exactly once; all
    ray tiles advance together. Per plane: batched patch extraction (one
    dynamic-slice per tile), separable hat-weight interpolation as batched
    MXU matmuls, MLP, and an in-order transmittance update carried across the
    scan. Traffic ~= grid size + T*Z patches instead of T*Z full planes.

    a_tiles/b_tiles: [T, R, 2] affine xy coefficients; vd_tiles: [T, R, 3].
    Returns (rgb [T,R,3], depth [T,R], alphainv_last [T,R]).
    """
    Z, X, Y, Cp = packed.shape
    if mask_ch is None:
        mX, mY = mask_planes.shape[1:]
    else:  # mask rides as a packed channel; scan a zero-size dummy instead
        mask_planes = jnp.zeros((Z, 1, 1), dtype=jnp.float32)
    T, R, _ = a_tiles.shape
    mm_dtype = jnp.bfloat16 if use_bf16 else jnp.float32
    mlp_mm = jax.tree.map(lambda x: x.astype(mm_dtype), mlp_params)
    viewdir_emb = ray_ops.positional_encoding(vd_tiles, cfg.viewbase_pe)  # [T,R,E]

    def mask_lookup(mplane, pos):
        """Nearest-neighbor maskcache lookup in MASK index space via one-hot
        (snapped) hat weights -- exact at any mask resolution."""
        pos_mx = pos[..., 0] * msx  # [T,R]
        pos_my = pos[..., 1] * msy
        oxm = jnp.clip(jnp.floor(jnp.min(pos_mx, axis=1)).astype(jnp.int32) - 1,
                       0, mX - mpatch)
        oym = jnp.clip(jnp.floor(jnp.min(pos_my, axis=1)).astype(jnp.int32) - 1,
                       0, mY - mpatch)
        mpatches = jax.vmap(
            lambda x0, y0: jax.lax.dynamic_slice(mplane, (x0, y0), (mpatch, mpatch))
        )(oxm, oym)  # [T,Pm,Pm]
        taps_m = jnp.arange(mpatch, dtype=pos.dtype)
        dxm = (pos_mx - oxm[:, None].astype(pos.dtype))[..., None] - taps_m
        dym = (pos_my - oym[:, None].astype(pos.dtype))[..., None] - taps_m
        wxn = ((dxm >= -0.5) & (dxm < 0.5)).astype(mm_dtype)
        wyn = ((dym >= -0.5) & (dym < 0.5)).astype(mm_dtype)
        mtmp = jnp.einsum("trp,tpq->trq", wxn, mpatches.astype(mm_dtype),
                          preferred_element_type=jnp.float32)
        return jnp.sum(wyn.astype(jnp.float32) * mtmp, axis=-1)  # [T,R]

    def body(carry, inp):
        t_cum, rgb_acc, depth_acc, alive = carry  # [T,R] / [T,R,3]
        plane, shift_k, k, mplane = inp  # [X,Y,Cp], [], [], [mX,mY]
        pos = a_tiles + b_tiles * k  # [T,R,2]

        ox = jnp.clip(jnp.floor(jnp.min(pos[..., 0], axis=1)).astype(jnp.int32) - 1,
                      0, X - patch)  # [T]
        oy = jnp.clip(jnp.floor(jnp.min(pos[..., 1], axis=1)).astype(jnp.int32) - 1,
                      0, Y - patch)
        patches = jax.vmap(
            lambda x0, y0: jax.lax.dynamic_slice(plane, (x0, y0, 0), (patch, patch, Cp))
        )(ox, oy)  # [T,P,P,Cp]

        rel_x = pos[..., 0] - ox[:, None].astype(pos.dtype)
        rel_y = pos[..., 1] - oy[:, None].astype(pos.dtype)
        taps = jnp.arange(patch, dtype=pos.dtype)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(rel_x[..., None] - taps))  # [T,R,P]
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(rel_y[..., None] - taps))

        tmp = jnp.einsum(
            "trp,tpqc->trqc", wx.astype(mm_dtype), patches.astype(mm_dtype),
            preferred_element_type=jnp.float32,
        )
        samp = jnp.einsum("trq,trqc->trc", wy, tmp)  # [T,R,Cp]
        if mask_ch is not None:
            # in-patch exact nearest mask: one-hot nearest-y picks a single
            # 1-D x-bilerp of the 0/1 mask channel; floor(+0.5) of that
            # value is the mask at the nearest x tap
            wyn = jnp.floor(wy + 0.5)
            mval = jnp.floor(
                jnp.einsum("trq,trq->tr", wyn, tmp[..., mask_ch]) + 0.5)
        else:
            mval = mask_lookup(mplane, pos)

        density = samp[..., 0]
        feat = samp[..., 1:1 + k0_dim]
        alpha = render.raw2alpha(density, shift_k, interval)
        inb = (
            (pos[..., 0] >= 0) & (pos[..., 0] <= X - 1)
            & (pos[..., 1] >= 0) & (pos[..., 1] <= Y - 1)
        )
        alpha = jnp.where(inb & (mval > 0.5), alpha, 0.0)
        if cfg.fast_color_thres > 0:
            alpha = jnp.where(alpha > cfg.fast_color_thres, alpha, 0.0)
        alpha = jnp.where(alive, alpha, 0.0)

        pe_spa = jnp.stack([
            jnp.full((T, R), 2.0 * k / (Z - 1) - 1.0, dtype=samp.dtype),
            pos[..., 1] / (Y - 1) * 2.0 - 1.0,
            pos[..., 0] / (X - 1) * 2.0 - 1.0,
        ], axis=-1)
        pe_emb = ray_ops.positional_encoding(pe_spa, cfg.spatial_pe)
        rgb_feat = jnp.concatenate([feat, pe_emb, viewdir_emb], axis=-1)
        rgb_raw = jax.nn.sigmoid(
            common.mlp_apply(mlp_mm, rgb_feat.astype(mm_dtype), act).astype(jnp.float32)
        )

        w = t_cum * alpha
        if cfg.fast_color_thres > 0:
            w = jnp.where(w > cfg.fast_color_thres, w, 0.0)
        rgb_acc = rgb_acc + w[..., None] * rgb_raw
        depth_acc = depth_acc + w * ((k + 0.5) / Z)
        t_new = t_cum * (1.0 - alpha)
        alive_new = alive & (t_new >= render.EARLY_TERM_THRES)
        return (t_new, rgb_acc, depth_acc, alive_new), None

    init = (
        jnp.ones((T, R), dtype=jnp.float32),
        jnp.zeros((T, R, 3), dtype=jnp.float32),
        jnp.zeros((T, R), dtype=jnp.float32),
        jnp.ones((T, R), dtype=bool),
    )
    ks = jnp.arange(Z, dtype=jnp.float32)
    (t_cum, rgb_acc, depth_acc, _alive), _ = jax.lax.scan(
        body, init, (packed, act_shift, ks, mask_planes)
    )
    rgb = rgb_acc + t_cum[..., None] * bg
    return rgb, depth_acc, t_cum


def sweep_patch_train(cfg, params, buffers, rays_o, rays_d, viewdirs, *,
                      stepsize: float, bg: float, patch_hw=None, key=None,
                      rand_bkgd: bool = False, is_train: bool = True,
                      patch: int = 48, use_bf16: bool = True, check: bool = True):
    """Differentiable patch render via the plane sweep, for training.

    Renders one pixel patch (``patch_hw = (pr, pc)``; rays flattened [R,3])
    and returns the same dense dict as ``dmpigo.forward`` (weights/raw_rgb/s
    as [R, K]) so the loss assembly is unchanged -- but the grid reads are
    dynamic-slice + matmul instead of scalar gathers, and gradients flow
    through to density/k0/rgbnet (scan + matmul are natively differentiable).

    The tile footprint must fit ``patch`` (checked against the true positions;
    raises ValueError for the caller to fall back to the gather path).
    """
    from fourk_nerf_tpu.models import dmpigo

    assert dmpigo.plane_aligned_ok(cfg, stepsize, ndc=True)
    X, Y, Z = cfg.world_size
    xyz_min = jnp.asarray(cfg.xyz_min)
    xyz_max = jnp.asarray(cfg.xyz_max)
    sizes = jnp.asarray([X, Y], dtype=jnp.float32)
    a, b = _affine_coeffs(rays_o, rays_d, xyz_min, xyz_max, sizes, Z)

    if check:  # host-side; skip when called under an outer jit
        a_np, b_np = np.asarray(a), np.asarray(b)
        for k_ext in (0.0, float(Z - 1)):
            p = a_np + b_np * k_ext
            spread = p.max(0) - p.min(0)
            if (spread > patch - 3).any():
                raise ValueError(f"patch footprint {spread} exceeds {patch}")

    interval = stepsize * cfg.voxel_size_ratio
    out = _sweep_patch_jit(
        cfg, params, buffers, a, b, viewdirs,
        interval=float(interval), patch=patch, use_bf16=use_bf16,
    )
    weights, raw_rgb, t_cum, rgb_feature, depth = out
    R = rays_o.shape[0]
    if rand_bkgd and is_train:
        assert key is not None
        noise = jax.random.uniform(key, (R, 3), dtype=rgb_feature.dtype)
        rgb_marched = rgb_feature + t_cum[:, None] * noise
    else:
        rgb_marched = rgb_feature + t_cum[:, None] * bg
    s = jnp.broadcast_to(
        ((jnp.arange(Z, dtype=jnp.float32) + 0.5) / Z)[None, :], (R, Z)
    )
    return {
        "alphainv_last": t_cum,
        "weights": weights,
        "rgb_marched": rgb_marched,
        "rgb_feature": rgb_feature,
        "raw_rgb": raw_rgb,
        "n_max": Z,
        "s": s,
        "depth": jax.lax.stop_gradient(jnp.sum(weights * s, axis=-1)),
    }


def sweep_window_origin(a, b, Z: int, X: int, Y: int, window: int):
    """Origin of the static-size grid window covering a ray patch's UNION
    footprint over all Z planes (pos(k) = a + b*k is affine in k, so the
    union extremes sit at k = 0 and k = Z-1).  Returns (ox, oy) int32
    scalars, clipped so the window stays inside the [X, Y] grid."""
    p1 = a + b * (Z - 1)
    mn = jnp.minimum(a.reshape(-1, 2).min(0), p1.reshape(-1, 2).min(0))
    ox = jnp.clip(jnp.floor(mn[0]).astype(jnp.int32) - 1, 0, X - window)
    oy = jnp.clip(jnp.floor(mn[1]).astype(jnp.int32) - 1, 0, Y - window)
    return ox, oy


def sweep_patch_train_win(cfg, win_params, win_buffers, a, b, viewdirs, *,
                          origin, interval: float, patch: int, bg: float,
                          key=None, rand_bkgd: bool = False,
                          is_train: bool = True, use_bf16: bool = True):
    """Windowed variant of :func:`sweep_patch_train` for the joint G-step's
    footprint-window optimization (ROADMAP round-3: the full-grid pack +
    full-grid Adam stream dominates the 141 ms step at fern scale).

    ``win_params`` holds only the patch's static-size grid window
    (density/k0 ``[W,W,Z,*]`` sliced at ``origin`` by the caller, OUTSIDE
    the grad computation, so gradients are window-shaped) plus the full
    rgbnet.  ``win_buffers``: act_shift (full, per-plane) and mask_cache
    (windowed identically when mask res == grid res, else full).  ``a, b``
    stay GLOBAL affine coefficients; ``origin = (ox, oy)`` int32.

    Bit-identical to the full-grid path: the per-plane slice origins shift
    by the integer window origin, so the hat-weight taps hit the same
    voxels in the same order; out-of-window taps had exactly-zero hat
    weight in the full path too (window sized to the union footprint via
    ``sweep_window_size_for``)."""
    X, Y, Z = cfg.world_size  # GLOBAL extents
    ox, oy = origin
    origin_f = jnp.stack([ox, oy]).astype(a.dtype)

    packed, act_shift, mask_info = pack_grids(cfg, win_params, win_buffers)
    mode, mask_val = mask_info
    if mode != "channel":
        raise NotImplementedError(
            "windowed G-step requires channel-mode mask (mask res == grid "
            "res); caller must fall back to sweep_patch_train")
    act = common.activation(cfg.act_type)
    w_t, t_cum_t, feat_t, raw_t = sweep_all_tiles_train(
        packed, act_shift, None, a[None], b[None], viewdirs[None],
        win_params["rgbnet"], cfg=cfg, interval=interval, patch=patch,
        k0_dim=cfg.k0_dim, act=act, msx=1.0, msy=1.0, mpatch=8,
        use_bf16=use_bf16, mask_ch=mask_val,
        origin=origin_f, bounds=(X, Y),
    )
    weights, raw_rgb, t_cum, rgb_feature = w_t[0], raw_t[0], t_cum_t[0], feat_t[0]
    R = a.shape[0]
    if rand_bkgd and is_train:
        assert key is not None
        noise = jax.random.uniform(key, (R, 3), dtype=rgb_feature.dtype)
        rgb_marched = rgb_feature + t_cum[:, None] * noise
    else:
        rgb_marched = rgb_feature + t_cum[:, None] * bg
    s = jnp.broadcast_to(
        ((jnp.arange(Z, dtype=jnp.float32) + 0.5) / Z)[None, :], (R, Z)
    )
    return {
        "alphainv_last": t_cum,
        "weights": weights,
        "rgb_marched": rgb_marched,
        "rgb_feature": rgb_feature,
        "raw_rgb": raw_rgb,
        "n_max": Z,
        "s": s,
        "depth": jax.lax.stop_gradient(jnp.sum(weights * s, axis=-1)),
    }


@functools.partial(jax.jit, static_argnames=("cfg", "interval", "patch", "use_bf16"))
def _sweep_patch_jit(cfg, params, buffers, a, b, viewdirs, *, interval: float,
                     patch: int, use_bf16: bool):
    if not use_bf16:
        # the f32 path is the reference-exact/metrics path: force true-f32
        # MXU passes (TPU matmul default precision is bf16-grade on f32)
        with jax.default_matmul_precision("highest"):
            return _sweep_patch_impl(cfg, params, buffers, a, b, viewdirs,
                                     interval=interval, patch=patch,
                                     use_bf16=use_bf16)
    return _sweep_patch_impl(cfg, params, buffers, a, b, viewdirs,
                             interval=interval, patch=patch, use_bf16=use_bf16)


def _sweep_patch_impl(cfg, params, buffers, a, b, viewdirs, *, interval: float,
                      patch: int, use_bf16: bool):
    packed, act_shift, mask_info = pack_grids(cfg, params, buffers)
    mode, mask_val = mask_info
    mask_ch = mask_val if mode == "channel" else None
    mask_planes = mask_val if mode == "native" else None
    msx, msy, mpatch = mask_scale_and_patch(cfg, buffers["mask_cache"].shape, patch)
    act = common.activation(cfg.act_type)
    # single tile: add the T axis
    w_t, t_cum_t, feat_t, raw_t = sweep_all_tiles_train(
        packed, act_shift, mask_planes, a[None], b[None], viewdirs[None],
        params["rgbnet"], cfg=cfg, interval=interval, patch=patch,
        k0_dim=cfg.k0_dim, act=act, msx=msx, msy=msy, mpatch=mpatch,
        use_bf16=use_bf16, mask_ch=mask_ch,
    )
    return w_t[0], raw_t[0], t_cum_t[0], feat_t[0], None


def sweep_all_tiles_train(packed, act_shift, mask_planes, a_tiles, b_tiles,
                          vd_tiles, mlp_params, *, cfg, interval, patch: int,
                          k0_dim: int, act, msx: float, msy: float,
                          mpatch: int, use_bf16: bool = True,
                          mask_ch: int | None = None, origin=None,
                          bounds=None):
    """Like :func:`sweep_all_tiles` but additionally emits per-sample weights
    and raw rgb ([T, R, Z] / [T, R, Z, 3]) for the training losses.

    ``origin``/``bounds`` enable WINDOWED operation (the joint G-step's
    footprint-window optimization): ``packed`` is then only the patch's
    static-size grid window sliced at ``origin`` ([2] float, grid units)
    out of a global grid of extent ``bounds=(X_glob, Y_glob)``.  Ray
    positions stay in GLOBAL grid units for the in-bounds test, spatial PE
    and the (native-mode) mask lookup; only the slice/hat-weight taps are
    shifted into window coordinates.  With ``origin=None`` behavior is
    bit-identical to the full-grid path."""
    Z, X, Y, Cp = packed.shape
    Xg, Yg = bounds if bounds is not None else (X, Y)
    if mask_ch is None:
        mX, mY = mask_planes.shape[1:]
    else:
        mask_planes = jnp.zeros((Z, 1, 1), dtype=jnp.float32)
    T, R, _ = a_tiles.shape
    mm_dtype = jnp.bfloat16 if use_bf16 else jnp.float32
    mlp_mm = jax.tree.map(lambda x: x.astype(mm_dtype), mlp_params)
    viewdir_emb = ray_ops.positional_encoding(vd_tiles, cfg.viewbase_pe)

    def mask_lookup(mplane, pos):
        # one-hot nearest lookup in mask index space (see sweep_all_tiles);
        # no gradient flows through the gate
        pos_mx = pos[..., 0] * msx
        pos_my = pos[..., 1] * msy
        oxm = jnp.clip(jnp.floor(jnp.min(pos_mx, axis=1)).astype(jnp.int32) - 1,
                       0, mX - mpatch)
        oym = jnp.clip(jnp.floor(jnp.min(pos_my, axis=1)).astype(jnp.int32) - 1,
                       0, mY - mpatch)
        mpatches = jax.vmap(
            lambda x0, y0: jax.lax.dynamic_slice(mplane, (x0, y0), (mpatch, mpatch))
        )(oxm, oym)
        taps_m = jnp.arange(mpatch, dtype=pos.dtype)
        dxm = (pos_mx - oxm[:, None].astype(pos.dtype))[..., None] - taps_m
        dym = (pos_my - oym[:, None].astype(pos.dtype))[..., None] - taps_m
        wxn = ((dxm >= -0.5) & (dxm < 0.5)).astype(mm_dtype)
        wyn = ((dym >= -0.5) & (dym < 0.5)).astype(mm_dtype)
        mtmp = jnp.einsum("trp,tpq->trq", wxn, mpatches.astype(mm_dtype),
                          preferred_element_type=jnp.float32)
        return jnp.sum(wyn.astype(jnp.float32) * mtmp, axis=-1)

    def body(carry, inp):
        t_cum, alive = carry
        plane, shift_k, k, mplane = inp
        pos = a_tiles + b_tiles * k          # GLOBAL grid units
        pos_loc = pos if origin is None else pos - origin
        ox = jnp.clip(jnp.floor(jnp.min(pos_loc[..., 0], axis=1)).astype(jnp.int32) - 1,
                      0, X - patch)
        oy = jnp.clip(jnp.floor(jnp.min(pos_loc[..., 1], axis=1)).astype(jnp.int32) - 1,
                      0, Y - patch)
        patches = jax.vmap(
            lambda x0, y0: jax.lax.dynamic_slice(plane, (x0, y0, 0), (patch, patch, Cp))
        )(ox, oy)
        taps = jnp.arange(patch, dtype=pos.dtype)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs((pos_loc[..., 0] - ox[:, None].astype(pos.dtype))[..., None] - taps))
        wy = jnp.maximum(0.0, 1.0 - jnp.abs((pos_loc[..., 1] - oy[:, None].astype(pos.dtype))[..., None] - taps))
        tmp = jnp.einsum("trp,tpqc->trqc", wx.astype(mm_dtype), patches.astype(mm_dtype),
                         preferred_element_type=jnp.float32)
        samp = jnp.einsum("trq,trqc->trc", wy, tmp)
        if mask_ch is not None:
            wyn = jnp.floor(wy + 0.5)
            mval = jax.lax.stop_gradient(jnp.floor(
                jnp.einsum("trq,trq->tr", wyn, tmp[..., mask_ch]) + 0.5))
        else:
            mval = mask_lookup(mplane, pos)

        density = samp[..., 0]
        feat = samp[..., 1:1 + k0_dim]
        alpha = render.raw2alpha(density, shift_k, interval)
        inb = (
            (pos[..., 0] >= 0) & (pos[..., 0] <= Xg - 1)
            & (pos[..., 1] >= 0) & (pos[..., 1] <= Yg - 1)
        )
        alpha = jnp.where(inb & (mval > 0.5), alpha, 0.0)
        if cfg.fast_color_thres > 0:
            alpha = jnp.where(alpha > cfg.fast_color_thres, alpha, 0.0)
        alpha = jnp.where(alive, alpha, 0.0)

        pe_spa = jnp.stack([
            jnp.full((T, R), 2.0 * k / (Z - 1) - 1.0, dtype=samp.dtype),
            pos[..., 1] / (Yg - 1) * 2.0 - 1.0,
            pos[..., 0] / (Xg - 1) * 2.0 - 1.0,
        ], axis=-1)
        pe_emb = ray_ops.positional_encoding(pe_spa, cfg.spatial_pe)
        rgb_feat = jnp.concatenate([feat, pe_emb, viewdir_emb], axis=-1)
        rgb_raw = jax.nn.sigmoid(
            common.mlp_apply(mlp_mm, rgb_feat.astype(mm_dtype), act).astype(jnp.float32)
        )

        w = t_cum * alpha
        if cfg.fast_color_thres > 0:
            w = jnp.where(w > cfg.fast_color_thres, w, 0.0)
        t_new = t_cum * (1.0 - alpha)
        alive_new = alive & (t_new >= render.EARLY_TERM_THRES)
        return (t_new, alive_new), (w, rgb_raw)

    init = (jnp.ones((T, R), dtype=jnp.float32), jnp.ones((T, R), dtype=bool))
    ks = jnp.arange(Z, dtype=jnp.float32)
    (t_cum, _alive), (w_seq, rgb_seq) = jax.lax.scan(
        body, init, (packed, act_shift, ks, mask_planes)
    )
    weights = jnp.moveaxis(w_seq, 0, -1)         # [T,R,Z]
    raw_rgb = jnp.moveaxis(rgb_seq, 0, 2)        # [T,R,Z,3]
    rgb_feature = jnp.sum(weights[..., None] * raw_rgb, axis=2)
    return weights, t_cum, rgb_feature, raw_rgb


@functools.partial(jax.jit, static_argnames=("cfg", "interval", "patch", "bg", "use_bf16"))
def _sweep_tiles(cfg, params, buffers, a_tiles, b_tiles, vd_tiles, *,
                 interval: float, patch: int, bg: float, use_bf16: bool = True):
    if not use_bf16:  # metrics path: true-f32 MXU (see _sweep_patch_jit)
        with jax.default_matmul_precision("highest"):
            return _sweep_tiles_impl(cfg, params, buffers, a_tiles, b_tiles,
                                     vd_tiles, interval=interval, patch=patch,
                                     bg=bg, use_bf16=use_bf16)
    return _sweep_tiles_impl(cfg, params, buffers, a_tiles, b_tiles, vd_tiles,
                             interval=interval, patch=patch, bg=bg,
                             use_bf16=use_bf16)


def _sweep_tiles_impl(cfg, params, buffers, a_tiles, b_tiles, vd_tiles, *,
                      interval: float, patch: int, bg: float, use_bf16: bool):
    packed, act_shift, mask_info = pack_grids(cfg, params, buffers)
    mode, mask_val = mask_info
    mask_ch = mask_val if mode == "channel" else None
    mask_planes = mask_val if mode == "native" else None
    msx, msy, mpatch = mask_scale_and_patch(cfg, buffers["mask_cache"].shape, patch)
    act = common.activation(cfg.act_type)
    return sweep_all_tiles(
        packed, act_shift, mask_planes, a_tiles, b_tiles, vd_tiles,
        params["rgbnet"], cfg=cfg, interval=interval, patch=patch,
        k0_dim=cfg.k0_dim, bg=bg, act=act, msx=msx, msy=msy, mpatch=mpatch,
        use_bf16=use_bf16, mask_ch=mask_ch,
    )


@functools.partial(
    jax.jit,
    static_argnames=("H", "W", "tile", "X", "Y", "Z", "inverse_y", "flip_x",
                     "flip_y"),
)
def _tile_spread(K, c2w, xyz_min, xyz_max, *, H: int, W: int, tile: int,
                 X: int, Y: int, Z: int, inverse_y: bool, flip_x: bool,
                 flip_y: bool):
    """Max per-tile footprint spread at the k extremes, fully on device (one
    scalar crosses to the host -- pulling the [H,W,2] affine maps through a
    tunneled device link costs seconds)."""
    ro, rd, _ = ray_ops.get_rays_of_a_view(
        H, W, K, c2w, ndc=True, inverse_y=inverse_y, flip_x=flip_x,
        flip_y=flip_y)
    sizes = jnp.asarray([X, Y], dtype=jnp.float32)
    a, b = _affine_coeffs(ro, rd, xyz_min, xyz_max, sizes, Z)
    ph, pw = (-H) % tile, (-W) % tile
    pad2 = lambda x: jnp.pad(x, ((0, ph), (0, pw), (0, 0)), mode="edge")
    a_t, b_t = pad2(a), pad2(b)
    nty, ntx = (H + ph) // tile, (W + pw) // tile

    def tiles_of(x):
        return (x.reshape(nty, tile, ntx, tile, 2).transpose(0, 2, 1, 3, 4)
                .reshape(nty * ntx, tile * tile, 2))

    at, bt = tiles_of(a_t), tiles_of(b_t)
    spread = jnp.float32(0.0)
    for k in (0.0, float(Z - 1)):
        pos = at + bt * k
        spread = jnp.maximum(spread, (pos.max(1) - pos.min(1)).max())
    return spread


_spread_cache: dict = {}  # pose-keyed: one ~35ms tunnel pull per NEW camera


def auto_tile_patch(cfg, H, W, K, c2w, *, inverse_y=False, flip_x=False,
                    flip_y=False, max_patch: int | None = None):
    """Pick (tile, patch) so every tile's footprint fits its slice: start at
    tile=32 and halve until the required patch fits the grid. Returns
    (tile, patch) or None when even tile=4 cannot fit (caller falls back)."""
    X, Y, Z = cfg.world_size
    max_patch = max_patch or min(X, Y)
    tile = 32
    while tile >= 4:
        key = (np.asarray(K).tobytes(), np.asarray(c2w).tobytes(), H, W,
               tile, X, Y, Z, inverse_y, flip_x, flip_y,
               tuple(cfg.xyz_min), tuple(cfg.xyz_max))
        spread = _spread_cache.get(key)
        if spread is None:
            spread = float(_tile_spread(
                jnp.asarray(K), jnp.asarray(c2w), jnp.asarray(cfg.xyz_min),
                jnp.asarray(cfg.xyz_max), H=H, W=W, tile=tile, X=X, Y=Y, Z=Z,
                inverse_y=inverse_y, flip_x=flip_x, flip_y=flip_y))
            if len(_spread_cache) > 64:
                _spread_cache.clear()
            _spread_cache[key] = spread
        patch = int(np.ceil((spread + 4) / 8.0) * 8)
        if patch <= max_patch:
            return tile, max(patch, 16)
        tile //= 2
    return None


@functools.partial(
    jax.jit,
    static_argnames=("H", "W", "tile", "X", "Y", "Z", "vpe", "inverse_y",
                     "flip_x", "flip_y"),
)
def _prep_tiles(K, c2w, xyz_min, xyz_max, *, H: int, W: int, tile: int,
                X: int, Y: int, Z: int, vpe: int, inverse_y: bool,
                flip_x: bool, flip_y: bool):
    """Device-side frame prep in one dispatch: rays -> affine coeffs ->
    row-major [T, R, c] tiles (vpe=0 returns raw viewdirs)."""
    ro, rd, vd = ray_ops.get_rays_of_a_view(
        H, W, K, c2w, ndc=True, inverse_y=inverse_y, flip_x=flip_x,
        flip_y=flip_y)
    sizes = jnp.asarray([X, Y], dtype=jnp.float32)
    a, b = _affine_coeffs(ro, rd, xyz_min, xyz_max, sizes, Z)
    ph, pw = (-H) % tile, (-W) % tile
    pad2 = lambda x: jnp.pad(x, ((0, ph), (0, pw), (0, 0)), mode="edge")
    a_t, b_t, vd_t = pad2(a), pad2(b), pad2(vd)
    nty, ntx = (H + ph) // tile, (W + pw) // tile

    def tiles_of(x):
        c = x.shape[-1]
        return (x.reshape(nty, tile, ntx, tile, c).transpose(0, 2, 1, 3, 4)
                .reshape(nty * ntx, tile * tile, c))

    vd_out = ray_ops.positional_encoding(vd_t, vpe) if vpe else vd_t
    return tiles_of(a_t), tiles_of(b_t), tiles_of(vd_out)


def render_frame(cfg, params, buffers, H: int, W: int, K, c2w, *, stepsize: float,
                 bg: float, tile: int = 32, patch: int = 32, inverse_y=False,
                 flip_x=False, flip_y=False, use_bf16: bool = True):
    """Full-frame gather-free render. Requires the plane-aligned conditions
    (dmpigo.plane_aligned_ok). Returns dict with rgb/depth/alphainv maps."""
    from fourk_nerf_tpu.models import dmpigo

    assert dmpigo.plane_aligned_ok(cfg, stepsize, ndc=True)
    xyz_min = jnp.asarray(cfg.xyz_min)
    xyz_max = jnp.asarray(cfg.xyz_max)
    X, Y, Z = cfg.world_size
    sizes = jnp.asarray([X, Y], dtype=jnp.float32)

    # safety: every tile's footprint (at both sample extremes) must fit the
    # patch, else hat weights silently read zeros. The check runs on device
    # and pulls ONE scalar (a host-side check would pull the [H,W,2] affine
    # maps -- seconds through a tunneled device link), pose-cached.
    skey = (np.asarray(K).tobytes(), np.asarray(c2w).tobytes(), H, W,
            tile, X, Y, Z, inverse_y, flip_x, flip_y,
            tuple(cfg.xyz_min), tuple(cfg.xyz_max))
    spread = _spread_cache.get(skey)
    if spread is None:
        spread = float(_tile_spread(
            jnp.asarray(K), jnp.asarray(c2w), xyz_min, xyz_max,
            H=H, W=W, tile=tile, X=X, Y=Y, Z=Z,
            inverse_y=inverse_y, flip_x=flip_x, flip_y=flip_y))
        if len(_spread_cache) > 64:
            _spread_cache.clear()
        _spread_cache[skey] = spread
    if spread > patch - 3:
        raise ValueError(
            f"tile footprint {spread} exceeds patch {patch}; "
            "increase patch or decrease tile")

    a_tiles, b_tiles, vd_tiles = _prep_tiles(
        jnp.asarray(K), jnp.asarray(c2w), xyz_min, xyz_max,
        H=H, W=W, tile=tile, X=X, Y=Y, Z=Z, vpe=0,
        inverse_y=inverse_y, flip_x=flip_x, flip_y=flip_y)
    ph, pw = (-H) % tile, (-W) % tile
    Ht, Wt = H + ph, W + pw
    nty, ntx = Ht // tile, Wt // tile

    interval = stepsize * cfg.voxel_size_ratio
    rgb, depth, ail = _sweep_tiles(
        cfg, params, buffers, a_tiles, b_tiles, vd_tiles,
        interval=interval, patch=patch, bg=float(bg), use_bf16=use_bf16,
    )

    def untile(x):
        c = x.shape[-1] if x.ndim == 3 else 1
        x = x.reshape(nty, ntx, tile, tile, c).transpose(0, 2, 1, 3, 4)
        return x.reshape(Ht, Wt, c)[:H, :W]

    return {
        "rgb_marched": untile(rgb),
        "rgb_feature": untile(rgb) - untile(ail) * bg,
        "depth": untile(depth)[..., 0],
        "alphainv_last": untile(ail)[..., 0],
    }

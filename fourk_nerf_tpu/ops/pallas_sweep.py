"""Pallas fused plane-sweep renderer: the TPU-native replacement for the
reference's fused CUDA render pipeline (sampling + trilinear interpolation +
MLP + in-order transmittance, /root/reference/lib/cuda/render_utils_kernel.cu:
144-707 plus F.grid_sample, lib/grid.py:124).

One kernel program per pixel tile. The program loops over the depth planes,
double-buffering the plane-patch DMA from HBM while everything else (both
hat-weight contractions, the rgbnet MLP, the transmittance update) runs out
of VMEM -- eliminating the XLA sweep's three measured bottlenecks (per-plane
HBM materialization of the second contraction's operand, per-plane
dynamic-slice dispatch, and scan-carry HBM round-trips) and adding per-tile
EARLY PLANE TERMINATION: once every ray in the tile saturates
(transmittance < 1e-3, render_utils_kernel.cu:596-600) the remaining planes
are skipped entirely -- DMA included -- which the XLA scan can only mask,
not skip.

Numerics match :func:`fourk_nerf_tpu.ops.plane_sweep.sweep_all_tiles`
(same math, same masked-alpha formulation, nearest-neighbor mask lookup in
mask index space via one-hot hat weights).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fourk_nerf_tpu.ops import render

_NBUF = 2  # double buffering


def _pe_inline(x, n_freqs: int):
    """positional_encoding (ops/rays.py:93-104) unrolled for the kernel:
    [x, sin(x*2^i) channel-major, cos(x*2^i) channel-major]."""
    if n_freqs == 0:
        return x
    sins = jnp.concatenate(
        [jnp.sin(x[..., c:c + 1] * (2.0 ** i)) for c in range(x.shape[-1])
         for i in range(n_freqs)], axis=-1)
    coss = jnp.concatenate(
        [jnp.cos(x[..., c:c + 1] * (2.0 ** i)) for c in range(x.shape[-1])
         for i in range(n_freqs)], axis=-1)
    return jnp.concatenate([x, sins, coss], axis=-1)


def _sweep_kernel(a_ref, b_ref, vde_ref, act_ref, *rest,
                  Z: int, X: int, Y: int, Cp: int, mX: int, mY: int,
                  patch: int, mpatch: int, k0_dim: int, n_layers: int,
                  interval: float, fast_thres: float, spatial_pe: int,
                  msx: float, msy: float, act, early_exit: bool,
                  compute_dtype):
    mlp_refs = rest[:2 * n_layers]
    (packed_ref, maskp_ref, rgb_ref, depth_ref, ail_ref,
     patch_sc, mask_sc, sem, msem) = rest[2 * n_layers:]

    R = a_ref.shape[1]
    f32 = jnp.float32
    ax = a_ref[0, :, 0:1]  # [R,1]
    ay = a_ref[0, :, 1:2]
    bx = b_ref[0, :, 0:1]
    by = b_ref[0, :, 1:2]

    # chord endpoints: min over rays at k=0 and k=Z-1. The per-plane true min
    # is CONCAVE in k (min of linear fns), so it lies ON OR ABOVE the chord --
    # a chord-based origin always covers the footprint given the caller's
    # patch sizing (spread+4 at the extremes).
    x0 = jnp.min(ax)
    x1 = jnp.min(ax + bx * (Z - 1))
    y0 = jnp.min(ay)
    y1 = jnp.min(ay + by * (Z - 1))

    def origins(k):
        f = k.astype(f32) / max(Z - 1, 1)
        cx = x0 * (1.0 - f) + x1 * f
        cy = y0 * (1.0 - f) + y1 * f
        ox = jnp.clip(jnp.floor(cx).astype(jnp.int32) - 1, 0, X - patch)
        oy = jnp.clip(jnp.floor(cy).astype(jnp.int32) - 1, 0, Y - patch)
        oxm = jnp.clip(jnp.floor(cx * msx).astype(jnp.int32) - 1, 0, mX - mpatch)
        oym = jnp.clip(jnp.floor(cy * msy).astype(jnp.int32) - 1, 0, mY - mpatch)
        return ox, oy, oxm, oym

    def start_dma(slot, k):
        ox, oy, oxm, oym = origins(k)
        pltpu.make_async_copy(
            packed_ref.at[k, pl.ds(ox, patch), pl.ds(oy, patch), :],
            patch_sc.at[slot], sem.at[slot],
        ).start()
        pltpu.make_async_copy(
            maskp_ref.at[k, pl.ds(oxm, mpatch), pl.ds(oym, mpatch)],
            mask_sc.at[slot], msem.at[slot],
        ).start()

    def wait_dma(slot):
        pltpu.make_async_copy(patch_sc.at[slot], patch_sc.at[slot], sem.at[slot]).wait()
        pltpu.make_async_copy(mask_sc.at[slot], mask_sc.at[slot], msem.at[slot]).wait()

    start_dma(0, jnp.int32(0))
    if Z > 1:
        start_dma(1, jnp.int32(1))

    taps = jnp.arange(patch, dtype=f32)[None, :]      # [1,P]
    taps_m = jnp.arange(mpatch, dtype=f32)[None, :]   # [1,Pm]
    vde = vde_ref[0]                                   # [R,E]

    def plane_step(k, carry):
        t_cum, rgb_acc, depth_acc = carry  # [R,1], [R,3], [R,1]
        slot = k % _NBUF
        kf = k.astype(f32)
        pos_x = ax + bx * kf   # [R,1]
        pos_y = ay + by * kf

        wait_dma(slot)
        patch_v = patch_sc[slot]          # [P,P,Cp]
        mask_v = mask_sc[slot]            # [Pm,Pm]
        ox, oy, oxm, oym = origins(k)

        # start the next plane's DMA while computing this one
        @pl.when(k + _NBUF < Z)
        def _():
            start_dma(slot, k + _NBUF)

        dx = (pos_x - ox.astype(f32)) - taps          # [R,P]
        dy = (pos_y - oy.astype(f32)) - taps
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(dx)).astype(compute_dtype)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(dy)).astype(compute_dtype)

        # interpolation: [R,P] @ [P, P*Cp] on the MXU, then the per-ray
        # y-contraction out of VMEM (multiply + tree-reduce over q)
        tmp = jax.lax.dot_general(
            wx, patch_v.reshape(patch, patch * Cp).astype(compute_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [R, P*Cp] f32
        prod = tmp.reshape(R, patch, Cp) * wy.astype(f32)[..., None]
        samp = jnp.sum(prod, axis=1)  # [R,Cp]

        # nearest-neighbor occupancy via one-hot weights in mask index space
        dxm = (pos_x * msx - oxm.astype(f32)) - taps_m  # [R,Pm]
        dym = (pos_y * msy - oym.astype(f32)) - taps_m
        wxn = ((dxm >= -0.5) & (dxm < 0.5)).astype(compute_dtype)
        wyn = ((dym >= -0.5) & (dym < 0.5)).astype(f32)
        mtmp = jax.lax.dot_general(
            wxn, mask_v.astype(compute_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [R,Pm]
        mval = jnp.sum(wyn * mtmp, axis=1, keepdims=True)  # [R,1]

        density = samp[:, 0:1]
        shift_k = act_ref[0, k]
        alpha = 1.0 - jnp.exp(-jax.nn.softplus(density + shift_k) * interval)
        inb = ((pos_x >= 0) & (pos_x <= X - 1)
               & (pos_y >= 0) & (pos_y <= Y - 1))
        alpha = jnp.where(inb & (mval > 0.5), alpha, 0.0)
        if fast_thres > 0:
            alpha = jnp.where(alpha > fast_thres, alpha, 0.0)
        alive = t_cum >= render.EARLY_TERM_THRES
        alpha = jnp.where(alive, alpha, 0.0)

        # rgbnet MLP on the MXU
        pe_spa = jnp.concatenate([
            jnp.full((R, 1), 2.0 * kf / max(Z - 1, 1) - 1.0, dtype=f32),
            pos_y / (Y - 1) * 2.0 - 1.0,
            pos_x / (X - 1) * 2.0 - 1.0,
        ], axis=-1)
        pe_emb = _pe_inline(pe_spa, spatial_pe)
        h = jnp.concatenate([samp[:, 1:1 + k0_dim], pe_emb, vde],
                            axis=-1).astype(compute_dtype)
        for li in range(n_layers):
            w = mlp_refs[2 * li][...]
            bb = mlp_refs[2 * li + 1][...]
            h = jax.lax.dot_general(
                h, w.astype(compute_dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bb.astype(jnp.float32)
            if li < n_layers - 1:
                h = act(h).astype(compute_dtype)
        rgb_raw = jax.nn.sigmoid(h)  # [R,3]

        w_comp = t_cum * alpha
        if fast_thres > 0:
            w_comp = jnp.where(w_comp > fast_thres, w_comp, 0.0)
        rgb_acc = rgb_acc + w_comp * rgb_raw
        depth_acc = depth_acc + w_comp * ((kf + 0.5) / Z)
        t_new = t_cum * (1.0 - alpha)
        return t_new, rgb_acc, depth_acc

    init = (jnp.ones((R, 1), f32), jnp.zeros((R, 3), f32), jnp.zeros((R, 1), f32))
    if early_exit:
        # skip remaining planes (DMA included) once every ray saturates; the
        # double-buffered in-flight DMAs for k, k+1 were already issued, so
        # exit only stops ISSUING new ones -- nothing is left un-awaited
        # because a dead tile never waits again.
        def cond(state):
            k, (t_cum, _, _) = state
            return (k < Z) & (jnp.max(t_cum) >= render.EARLY_TERM_THRES)

        def wbody(state):
            k, carry = state
            return k + 1, plane_step(k, carry)

        _, (t_cum, rgb_acc, depth_acc) = jax.lax.while_loop(
            cond, wbody, (jnp.int32(0), init))
    else:
        t_cum, rgb_acc, depth_acc = jax.lax.fori_loop(0, Z, plane_step, init)

    rgb_ref[0] = rgb_acc
    depth_ref[0] = depth_acc[:, 0]
    ail_ref[0] = t_cum[:, 0]


@functools.partial(
    jax.jit,
    static_argnames=("patch", "mpatch", "k0_dim", "interval", "fast_thres",
                     "spatial_pe", "msx", "msy", "act", "early_exit",
                     "use_bf16", "interpret"),
)
def sweep_tiles_pallas(packed, act_shift, mask_planes, a_tiles, b_tiles,
                       vd_emb_tiles, mlp_flat, *, patch: int, mpatch: int,
                       k0_dim: int, interval: float, fast_thres: float,
                       spatial_pe: int, msx: float, msy: float, act,
                       early_exit: bool = True, use_bf16: bool = True,
                       interpret: bool = False):
    """Run the fused kernel over all tiles.

    packed: [Z,X,Y,Cp] (f32 or bf16), act_shift: [Z], mask_planes: [Z,mX,mY]
    f32, a/b_tiles: [T,R,2], vd_emb_tiles: [T,R,E], mlp_flat: flat tuple
    (w0,b0,w1,b1,...) with biases shaped [1,W].
    Returns (rgb [T,R,3], depth [T,R], alphainv_last [T,R]).
    """
    Z, X, Y, Cp = packed.shape
    mX, mY = mask_planes.shape[1:]
    T, R, _ = a_tiles.shape
    n_layers = len(mlp_flat) // 2
    compute_dtype = jnp.bfloat16 if use_bf16 else jnp.float32
    patch_dtype = packed.dtype

    kernel = functools.partial(
        _sweep_kernel, Z=Z, X=X, Y=Y, Cp=Cp, mX=mX, mY=mY, patch=patch,
        mpatch=mpatch, k0_dim=k0_dim, n_layers=n_layers, interval=interval,
        fast_thres=fast_thres, spatial_pe=spatial_pe, msx=msx, msy=msy,
        act=act, early_exit=early_exit, compute_dtype=compute_dtype,
    )

    tile_block = lambda c: pl.BlockSpec((1, R, c), lambda t: (t, 0, 0),
                                        memory_space=pltpu.VMEM)
    mlp_specs = []
    for arr in mlp_flat:
        mlp_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    rgb, depth, ail = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            tile_block(2),  # a
            tile_block(2),  # b
            tile_block(vd_emb_tiles.shape[-1]),  # viewdir PE
            pl.BlockSpec(memory_space=pltpu.VMEM),  # act_shift [1,Z]
            *mlp_specs,
            pl.BlockSpec(memory_space=pltpu.ANY),   # packed (manual DMA)
            pl.BlockSpec(memory_space=pltpu.ANY),   # mask planes (manual DMA)
        ],
        out_specs=(
            pl.BlockSpec((1, R, 3), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R), lambda t: (t, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, R, 3), jnp.float32),
            jax.ShapeDtypeStruct((T, R), jnp.float32),
            jax.ShapeDtypeStruct((T, R), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((_NBUF, patch, patch, Cp), patch_dtype),
            pltpu.VMEM((_NBUF, mpatch, mpatch), mask_planes.dtype),
            pltpu.SemaphoreType.DMA((_NBUF,)),
            pltpu.SemaphoreType.DMA((_NBUF,)),
        ],
        interpret=interpret,
    )(a_tiles, b_tiles, vd_emb_tiles, act_shift.reshape(1, -1), *mlp_flat,
      packed, mask_planes)
    return rgb, depth, ail


def render_frame_pallas(cfg, params, buffers, H: int, W: int, K, c2w, *,
                        stepsize: float, bg: float, tile: int = 32,
                        patch: int = 32, inverse_y=False, flip_x=False,
                        flip_y=False, use_bf16: bool = True,
                        early_exit: bool = True, interpret: bool = False):
    """Full-frame render through the fused Pallas kernel. Same contract as
    :func:`fourk_nerf_tpu.ops.plane_sweep.render_frame` (plane-aligned NDC
    conditions required; ValueError when the footprint exceeds the patch)."""
    from fourk_nerf_tpu.models import common, dmpigo
    from fourk_nerf_tpu.ops import plane_sweep, rays as ray_ops

    assert dmpigo.plane_aligned_ok(cfg, stepsize, ndc=True)
    X, Y, Z = cfg.world_size
    xyz_min = jnp.asarray(cfg.xyz_min)
    xyz_max = jnp.asarray(cfg.xyz_max)
    sizes = jnp.asarray([X, Y], dtype=jnp.float32)

    ro, rd, vd = ray_ops.get_rays_of_a_view(
        H, W, K, c2w, ndc=True, inverse_y=inverse_y, flip_x=flip_x, flip_y=flip_y
    )
    a, b = plane_sweep._affine_coeffs(ro, rd, xyz_min, xyz_max, sizes, Z)

    a_np, b_np = np.asarray(a), np.asarray(b)
    for k_ext in (0.0, float(Z - 1)):
        p = a_np + b_np * k_ext
        for ty in range(0, H, tile):
            for tx in range(0, W, tile):
                blk = p[ty:ty + tile, tx:tx + tile]
                spread = blk.reshape(-1, 2).max(0) - blk.reshape(-1, 2).min(0)
                if (spread > patch - 3).any():
                    raise ValueError(
                        f"tile footprint {spread} exceeds patch {patch}")

    ph, pw = (-H) % tile, (-W) % tile
    pad2 = lambda x: jnp.pad(x, ((0, ph), (0, pw), (0, 0)), mode="edge")
    a_t, b_t, vd_t = pad2(a), pad2(b), pad2(vd)
    Ht, Wt = H + ph, W + pw
    nty, ntx = Ht // tile, Wt // tile

    def tiles_of(x):
        c = x.shape[-1]
        return (x.reshape(nty, tile, ntx, tile, c).transpose(0, 2, 1, 3, 4)
                .reshape(nty * ntx, tile * tile, c))

    a_tiles, b_tiles, vd_tiles = tiles_of(a_t), tiles_of(b_t), tiles_of(vd_t)
    vd_emb_tiles = ray_ops.positional_encoding(vd_tiles, cfg.viewbase_pe)

    packed, act_shift, mask_planes = plane_sweep.pack_grids(cfg, params, buffers)
    if use_bf16:
        packed = packed.astype(jnp.bfloat16)
    msx, msy, mpatch = plane_sweep.mask_scale_and_patch(
        cfg, buffers["mask_cache"].shape, patch)

    mlp_flat = []
    mlp = params["rgbnet"]
    for li in range(len(mlp) // 2):
        mlp_flat.append(mlp[f"w{li}"])
        mlp_flat.append(mlp[f"b{li}"].reshape(1, -1))

    interval = float(stepsize * cfg.voxel_size_ratio)
    act = common.activation(cfg.act_type)
    rgb, depth, ail = sweep_tiles_pallas(
        packed, act_shift, mask_planes, a_tiles, b_tiles, vd_emb_tiles,
        tuple(mlp_flat), patch=patch, mpatch=mpatch, k0_dim=cfg.k0_dim,
        interval=interval, fast_thres=float(cfg.fast_color_thres),
        spatial_pe=cfg.spatial_pe, msx=msx, msy=msy, act=act,
        early_exit=early_exit, use_bf16=use_bf16, interpret=interpret,
    )
    rgb = rgb + ail[..., None] * bg

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

"""Pallas fused plane-sweep renderer: the TPU-native replacement for the
reference's fused CUDA render pipeline (sampling + trilinear interpolation +
MLP + in-order transmittance, /root/reference/lib/cuda/render_utils_kernel.cu:
144-707 plus F.grid_sample, lib/grid.py:124).

One kernel program per pixel tile. The program loops over the depth planes,
double-buffering the plane-patch DMA from HBM while everything else (the
hat-weight interpolation, the free-space mask test, the rgbnet MLP, and the
in-order transmittance update) runs out of VMEM -- eliminating the XLA
sweep's measured bottlenecks (per-plane HBM materialization of the second
contraction's operand, per-plane dynamic-slice dispatch, scan-carry HBM
round-trips) and adding per-tile EARLY PLANE TERMINATION: once every ray in
a tile saturates (transmittance < 1e-3, render_utils_kernel.cu:596-600) the
remaining planes are skipped entirely, DMA included -- the XLA scan can only
mask that work, not skip it.

Key layout decisions (Mosaic constraints):
- the grid is pre-flattened to ``[Z, X, Y*Cp]`` so patches land in VMEM in
  the matmul-ready ``[P, Py*Cp]`` layout (in-kernel lane reshapes are
  unsupported);
- DMA origins are snapped DOWN to the (8, 128) tiling and the patch is
  enlarged to keep coverage;
- the free-space mask rides as a float channel of the packed grid; exact
  nearest-neighbor semantics come from snapping each 1-D interpolation
  stage: ``floor(bilerp_x(mask) + 0.5)`` equals the mask at the nearest x
  tap (1-D!), and the snapped y one-hot then picks the nearest y tap --
  together reproducing ``maskcache_lookup``'s round() per axis;
- the y-contraction is an elementwise multiply in the flat layout followed
  by a log-tree of 128-aligned lane halvings and one small gather matmul.

Numerics (use_bf16=False) match
:func:`fourk_nerf_tpu.ops.plane_sweep.sweep_all_tiles` up to
nearest-boundary ties; parity-tested in tests/test_pallas_sweep.py.
"""

from __future__ import annotations

import functools
import math

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


def _nearest_resample_mask(mask, shape):
    """Nearest-neighbor resample of the bool mask grid onto the voxel grid
    (align_corners mapping). Only used when mask_cache_world_size differs
    from world_size; introduces at most a half-voxel boundary shift vs the
    reference's native-resolution lookup (quantified in tests)."""
    idx = []
    for d in range(3):
        m, n = mask.shape[d], shape[d]
        if n == 1 or m == 1:
            idx.append(jnp.zeros((n,), dtype=jnp.int32))
        else:
            idx.append(jnp.round(
                jnp.arange(n, dtype=jnp.float32) * (m - 1) / (n - 1)
            ).astype(jnp.int32))
    return mask[idx[0]][:, idx[1]][:, :, idx[2]]


def pack_grids_kernel(cfg, params, buffers, *, use_bf16: bool):
    """[Z, X, Y*Cp] flat packed grid for the kernel: density, k0, then the
    free-space mask as a float channel, padded to an 8-multiple channel
    count. Returns (packed_flat, act_shift [Z], Cp, mask_ch)."""
    density = params["density"]  # [X,Y,Z,1]
    k0 = params["k0"]            # [X,Y,Z,C]
    mask = buffers["mask_cache"]
    if mask.shape != density.shape[:3]:
        mask = _nearest_resample_mask(mask, density.shape[:3])
    packed = jnp.concatenate(
        [density, k0, mask.astype(density.dtype)[..., None]], axis=-1)
    cp = packed.shape[-1]
    pad = (-cp) % 8
    if pad:
        packed = jnp.pad(packed, ((0, 0), (0, 0), (0, 0), (0, pad)))
    Cp = cp + pad
    packed = jnp.transpose(packed, (2, 0, 1, 3))  # [Z,X,Y,Cp]
    if use_bf16:
        packed = packed.astype(jnp.bfloat16)
    Z, X, Y, _ = packed.shape
    # Mosaic DMA slice SIZES must be tiling-aligned too: pad X to a multiple
    # of 8 and Y so Y*Cp is a multiple of 128 (zeros are harmless -- the
    # in-bounds gate uses the LOGICAL dims, and the zero mask channel kills
    # any phantom sample anyway)
    ysnap = 128 // math.gcd(128, Cp)
    padx = (-X) % 8
    pady = (-Y) % ysnap
    if padx or pady:
        packed = jnp.pad(packed, ((0, 0), (0, padx), (0, pady), (0, 0)))
    act_shift = buffers["act_shift"][0, 0, :, 0]
    mask_ch = cp - 1
    Xp, Yp = X + padx, Y + pady
    return packed.reshape(Z, Xp, Yp * Cp), act_shift, Cp, mask_ch, (X, Y)


def _plan_patch(patch: int, X: int, Y: int, Cp: int):
    """Static DMA patch plan: x rows pxs (8-aligned origin snap needs +8
    slack), y taps pys a multiple of ysnap so both the lane offset
    (oy*Cp) and the slice width (pys*Cp) are 128-aligned.
    Returns (pxs, pys, ysnap)."""
    pxs = min(int(math.ceil((patch + 8) / 8.0) * 8), X)
    ysnap = 128 // math.gcd(128, Cp)
    need = patch + ysnap
    pys = int(math.ceil(need / ysnap) * ysnap)
    if pys > Y:
        pys = Y  # full-dim slice (Y pre-padded to an ysnap multiple)
    return pxs, pys, ysnap


def _lane_block_sum(z, n_blocks: int, Cp: int):
    """sum over q of z[:, q*Cp + c] -> [R, Cp]: fold 128-lane chunks (each a
    whole number of Cp blocks since Cp | 128), finish with one small gather
    matmul on the final 128 lanes."""
    lanes = n_blocks * Cp
    assert lanes % 128 == 0, (lanes, Cp)
    if lanes > 128:
        # accumulate in f32 regardless of z's dtype (bf16 products)
        acc = z[:, :128].astype(jnp.float32)
        for j in range(1, lanes // 128):
            acc = acc + z[:, j * 128:(j + 1) * 128].astype(jnp.float32)
        z = acc
    else:
        z = z.astype(jnp.float32)
    if 128 == Cp:
        return z
    rows = jax.lax.broadcasted_iota(jnp.int32, (128, Cp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (128, Cp), 1)
    g = (rows % Cp == cols).astype(z.dtype)
    return jax.lax.dot_general(
        z, g, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _sweep_kernel(a_ref, b_ref, vde_ref, act_ref, *rest,
                  Z: int, X: int, Y: int, Xl: int, Yl: int, Cp: int,
                  pxs: int, pys: int, ysnap: int, mask_ch: int, k0_dim: int,
                  n_layers: int, interval: float, fast_thres: float,
                  spatial_pe: int, act, early_exit: bool, compute_dtype):
    mlp_refs = rest[:2 * n_layers]
    packed_ref, rgb_ref, depth_ref, ail_ref, patch_sc, sem = rest[2 * n_layers:]

    R = a_ref.shape[1]
    f32 = jnp.float32
    ax = a_ref[0, :, 0:1]  # [R,1]
    ay = a_ref[0, :, 1:2]
    bx = b_ref[0, :, 0:1]
    by = b_ref[0, :, 1:2]

    # chord endpoints: the per-plane min over rays is CONCAVE in k (min of
    # linear fns) so it lies on/above the chord -- a chord origin always
    # covers the footprint given the caller's patch sizing + snap slack
    x0 = jnp.min(ax)
    x1 = jnp.min(ax + bx * (Z - 1))
    y0 = jnp.min(ay)
    y1 = jnp.min(ay + by * (Z - 1))

    # per-ray in-bounds plane interval: pos = a + b*k is linear, so the ray
    # is inside [0, dim-1] on one contiguous k range. Rays outside it can
    # never contribute -- without this, edge rays keep t_cum=1 forever and
    # per-tile early termination never fires.
    big = jnp.float32(1e9)

    def axis_interval(a_c, b_c, hi):
        t1 = (0.0 - a_c) / jnp.where(jnp.abs(b_c) > 1e-12, b_c, 1e-12)
        t2 = (hi - a_c) / jnp.where(jnp.abs(b_c) > 1e-12, b_c, 1e-12)
        lo_k = jnp.minimum(t1, t2)
        hi_k = jnp.maximum(t1, t2)
        inside0 = (a_c >= 0.0) & (a_c <= hi)
        degen = jnp.abs(b_c) <= 1e-12
        lo_k = jnp.where(degen, jnp.where(inside0, -big, big), lo_k)
        hi_k = jnp.where(degen, jnp.where(inside0, big, -big), hi_k)
        return lo_k, hi_k

    lox, hix = axis_interval(ax, bx, jnp.float32(Xl - 1))
    loy, hiy = axis_interval(ay, by, jnp.float32(Yl - 1))
    k_in = jnp.maximum(lox, loy)    # [R,1]
    k_out = jnp.minimum(hix, hiy)   # [R,1]
    k_start = jnp.clip(
        jnp.floor(jnp.min(jnp.where(k_in <= k_out, k_in, big))).astype(jnp.int32),
        0, Z - 1)

    def origins(k):
        f = k.astype(f32) / max(Z - 1, 1)
        cx = x0 * (1.0 - f) + x1 * f
        cy = y0 * (1.0 - f) + y1 * f
        # snap DOWN to the (8, 128) tiling; patch sizes carry the slack
        ox = jnp.clip((jnp.floor(cx).astype(jnp.int32) - 1) // 8 * 8,
                      0, X - pxs)
        oy = jnp.clip((jnp.floor(cy).astype(jnp.int32) - 1) // ysnap * ysnap,
                      0, Y - pys)
        return ox, oy

    def start_dma(slot, k):
        ox, oy = origins(k)
        # tell Mosaic the snapped origins ARE tiling-aligned
        ox_a = pl.multiple_of(ox, 8)
        oyc_a = pl.multiple_of(oy * Cp, 128)
        pltpu.make_async_copy(
            packed_ref.at[k, pl.ds(ox_a, pxs), pl.ds(oyc_a, pys * Cp)],
            patch_sc.at[slot], sem.at[slot],
        ).start()

    def wait_dma(slot):
        pltpu.make_async_copy(
            patch_sc.at[slot], patch_sc.at[slot], sem.at[slot]).wait()

    if early_exit:
        # the loop waits slot k%NBUF, so warmup slots must match k_start
        start_dma(k_start % _NBUF, k_start)

        @pl.when(k_start + 1 < Z)
        def _():
            start_dma((k_start + 1) % _NBUF, k_start + 1)
    else:
        start_dma(0, jnp.int32(0))
        if Z > 1:
            start_dma(1, jnp.int32(1))

    # Mosaic iota must be integer; cast after
    taps = jax.lax.broadcasted_iota(jnp.int32, (1, pxs), 1).astype(f32)
    taps_rep = (jax.lax.broadcasted_iota(jnp.int32, (1, pys * Cp), 1)
                // Cp).astype(f32)
    chan_ids = jax.lax.broadcasted_iota(jnp.int32, (1, pys * Cp), 1) % Cp
    is_mask_lane = chan_ids == mask_ch
    vde = vde_ref[0]  # [R,E]

    def plane_step(k, carry):
        t_cum, rgb_acc, depth_acc = carry  # [R,1], [R,3], [R,1]
        slot = k % _NBUF
        kf = k.astype(f32)
        pos_x = ax + bx * kf   # [R,1]
        pos_y = ay + by * kf

        wait_dma(slot)
        patch_v = patch_sc[slot]          # [pxs, pys*Cp]
        ox, oy = origins(k)

        # start the next plane's DMA while computing this one
        @pl.when(k + _NBUF < Z)
        def _():
            start_dma(slot, k + _NBUF)

        dx = (pos_x - ox.astype(f32)) - taps          # [R,pxs]
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(dx)).astype(compute_dtype)
        # VPU work stays f32 (v5e has no bf16 ALU instructions)
        dy_rep = (pos_y - oy.astype(f32)) - taps_rep  # [R, pys*Cp]
        wy_rep = jnp.maximum(0.0, 1.0 - jnp.abs(dy_rep))

        # x interpolation on the MXU; tmp's mask lanes = 1-D bilerp of the
        # 0/1 mask along x, so floor(+0.5) snaps them to the nearest x tap
        tmp = jax.lax.dot_general(
            wx, patch_v.astype(compute_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [R, pys*Cp] f32
        wy_n = jnp.floor(wy_rep + 0.5)       # one-hot nearest-y selector
        z = jnp.where(is_mask_lane,
                      jnp.floor(tmp + 0.5) * wy_n,
                      tmp * wy_rep)
        samp = _lane_block_sum(z, pys, Cp)   # [R,Cp] f32

        density = samp[:, 0:1]
        mval = samp[:, mask_ch:mask_ch + 1]
        shift_k = act_ref[0, k]
        alpha = 1.0 - jnp.exp(-jax.nn.softplus(density + shift_k) * interval)
        inb = ((pos_x >= 0) & (pos_x <= Xl - 1)
               & (pos_y >= 0) & (pos_y <= Yl - 1))
        alpha = jnp.where(inb & (mval > 0.5), alpha, 0.0)
        if fast_thres > 0:
            alpha = jnp.where(alpha > fast_thres, alpha, 0.0)
        alive = t_cum >= render.EARLY_TERM_THRES
        alpha = jnp.where(alive, alpha, 0.0)

        # rgbnet MLP on the MXU
        pe_spa = jnp.concatenate([
            jnp.full((R, 1), 2.0 * kf / max(Z - 1, 1) - 1.0, dtype=f32),
            pos_y / (Yl - 1) * 2.0 - 1.0,
            pos_x / (Xl - 1) * 2.0 - 1.0,
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
        # a ray is live while it is unsaturated AND not yet past its
        # in-bounds interval; the tile exits when no ray is live -- this is
        # the reference's per-ray break (render_utils_kernel.cu:596-600)
        # lifted to tile granularity, plus frustum-exit culling
        def cond(state):
            k, (t_cum, _, _) = state
            kf32 = k.astype(f32)
            live_t = jnp.where(kf32 <= k_out, t_cum, 0.0)
            return (k < Z) & (jnp.max(live_t) >= render.EARLY_TERM_THRES)

        def wbody(state):
            k, carry = state
            return k + 1, plane_step(k, carry)

        k_exit, (t_cum, rgb_acc, depth_acc) = jax.lax.while_loop(
            cond, wbody, (k_start, init))
        # drain in-flight DMAs on early exit: the scratch semaphores persist
        # into the next grid program, so leftover signals would corrupt its
        # waits. Issued-but-unawaited slots are k_exit .. min(k_exit+1, Z-1).
        for off in range(_NBUF):
            @pl.when(k_exit + off < Z)
            def _(off=off):
                wait_dma((k_exit + off) % _NBUF)
    else:
        t_cum, rgb_acc, depth_acc = jax.lax.fori_loop(0, Z, plane_step, init)

    rgb_ref[0] = rgb_acc
    depth_ref[0] = depth_acc
    ail_ref[0] = t_cum


@functools.partial(
    jax.jit,
    static_argnames=("Y", "Xl", "Yl", "Cp", "pxs", "pys", "ysnap", "mask_ch",
                     "k0_dim", "interval", "fast_thres", "spatial_pe", "act",
                     "early_exit", "use_bf16", "interpret"),
)
def sweep_tiles_pallas(packed_flat, act_shift, a_tiles, b_tiles,
                       vd_emb_tiles, mlp_flat, *, Y: int, Xl: int, Yl: int,
                       Cp: int, pxs: int, pys: int, ysnap: int, mask_ch: int,
                       k0_dim: int, interval: float, fast_thres: float,
                       spatial_pe: int, act, early_exit: bool = True,
                       use_bf16: bool = True, interpret: bool = False):
    """Run the fused kernel over all tiles.

    packed_flat: [Z, Xp, Yp*Cp] from :func:`pack_grids_kernel` (padded dims;
    Xl/Yl are the logical grid dims); a/b_tiles: [T,R,2]; vd_emb_tiles:
    [T,R,E]; mlp_flat: flat tuple (w0,b0,w1,b1,...) with biases [1,W].
    Returns (rgb [T,R,3], depth [T,R], alphainv_last [T,R]).
    """
    Z, X, _ = packed_flat.shape
    T, R, _ = a_tiles.shape
    n_layers = len(mlp_flat) // 2
    compute_dtype = jnp.bfloat16 if use_bf16 else jnp.float32

    kernel = functools.partial(
        _sweep_kernel, Z=Z, X=X, Y=Y, Xl=Xl, Yl=Yl, Cp=Cp, pxs=pxs, pys=pys,
        ysnap=ysnap, mask_ch=mask_ch, k0_dim=k0_dim, n_layers=n_layers,
        interval=interval, fast_thres=fast_thres, spatial_pe=spatial_pe,
        act=act, early_exit=early_exit, compute_dtype=compute_dtype,
    )

    tile_block = lambda c: pl.BlockSpec((1, R, c), lambda t: (t, 0, 0),
                                        memory_space=pltpu.VMEM)
    mlp_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in mlp_flat]

    rgb, depth, ail = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            tile_block(2),  # a
            tile_block(2),  # b
            tile_block(vd_emb_tiles.shape[-1]),  # viewdir PE
            pl.BlockSpec(memory_space=pltpu.SMEM),  # act_shift [1,Z]
            *mlp_specs,
            # the grid stays in HBM: VMEM sources would need aligned dynamic
            # origins beyond what the snap provides for small grids
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=(
            pl.BlockSpec((1, R, 3), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, 1), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, 1), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, R, 3), jnp.float32),
            jax.ShapeDtypeStruct((T, R, 1), jnp.float32),
            jax.ShapeDtypeStruct((T, R, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((_NBUF, pxs, pys * Cp), packed_flat.dtype),
            pltpu.SemaphoreType.DMA((_NBUF,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(a_tiles, b_tiles, vd_emb_tiles, act_shift.reshape(1, -1), *mlp_flat,
      packed_flat)
    return rgb, depth[..., 0], ail[..., 0]


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

    packed_flat, act_shift, Cp, mask_ch, (Xl, Yl) = pack_grids_kernel(
        cfg, params, buffers, use_bf16=use_bf16)
    Xp = packed_flat.shape[1]
    Yp = packed_flat.shape[2] // Cp
    pxs, pys, ysnap = _plan_patch(patch, Xp, Yp, Cp)

    mlp_flat = []
    mlp = params["rgbnet"]
    for li in range(len(mlp) // 2):
        mlp_flat.append(mlp[f"w{li}"])
        mlp_flat.append(mlp[f"b{li}"].reshape(1, -1))

    interval = float(stepsize * cfg.voxel_size_ratio)
    act = common.activation(cfg.act_type)
    rgb, depth, ail = sweep_tiles_pallas(
        packed_flat, act_shift, a_tiles, b_tiles, vd_emb_tiles,
        tuple(mlp_flat), Y=Yp, Xl=Xl, Yl=Yl, Cp=Cp, pxs=pxs, pys=pys,
        ysnap=ysnap, mask_ch=mask_ch, k0_dim=cfg.k0_dim, interval=interval,
        fast_thres=float(cfg.fast_color_thres), spatial_pe=cfg.spatial_pe,
        act=act, early_exit=early_exit, use_bf16=use_bf16,
        interpret=interpret,
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

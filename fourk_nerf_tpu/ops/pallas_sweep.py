"""Pallas fused plane-sweep renderer: the TPU-native replacement for the
reference's fused CUDA render pipeline (sampling + trilinear interpolation +
MLP + in-order transmittance, /root/reference/lib/cuda/render_utils_kernel.cu:
144-707 plus F.grid_sample, lib/grid.py:124).

One kernel program per TILE GROUP -- a column of pixel tiles sharing their
grid-x footprint. The program loops over the depth planes, double-buffering
one contiguous x-stripe DMA per plane (shared by the whole group) while
everything else (the hat-weight interpolation, the free-space mask test,
the rgbnet MLP, and the in-order transmittance update) runs out of VMEM --
and adds per-tile EARLY PLANE TERMINATION: once every ray in a tile
saturates (transmittance < 1e-3, render_utils_kernel.cu:596-600) that
tile's remaining planes are skipped, and the group exits when all its
tiles are done -- the XLA scan can only mask that work, not skip it.

Why groups: a one-tile-per-program kernel is bound twice over -- its
per-plane op chain is serialized by the transmittance carry (~5 us of
back-to-back vector-op latencies), and its per-tile patch DMAs either pay
per-row descriptor overhead (strided windows) or re-fetch overlapping
voxels tile after tile (full stripes). Grouping G tiles gives G
independent chains per plane (the hardware overlaps them) and shares one
stripe DMA among all G.

Layout: RAYS ARE LANES. Everything per-ray lives in ``[rows, R]`` with the
ray axis on the 128-lane dimension, so per-ray scalars (alpha, transmittance,
positions) cost ``R/128`` vector registers instead of the ``R`` that a
``[R, 1]`` layout would burn, and the y-stage hat weights are generated once
in the small ``[pys, R]`` shape instead of replicated across channels. The
x-interpolation is a single MXU ``dot_general`` contracting dim 0 of both
operands (``patch[pxs, pys*Cp] x wx[pxs, R] -> tmp[pys*Cp, R]``), the
y-contraction is a rank-3 broadcast multiply plus a pairwise tree of
contiguous sublane-block adds, and the MLP runs as ``W[Cin, width]``-
contracting matmuls that keep rays on the lanes throughout.

Key layout decisions (Mosaic constraints):
- the grid is pre-flattened to ``[Z, X, Y*Cp]`` so patches land in VMEM in
  the matmul-ready ``[pxs, pys*Cp]`` layout;
- DMA origins are snapped DOWN to the (8, 128) tiling and the patch is
  enlarged to keep coverage;
- the free-space mask rides as a float channel of the packed grid; exact
  nearest-neighbor semantics (reference ``maskcache_lookup``,
  render_utils_kernel.cu:367-424) come from per-axis snapping: the one-hot
  nearest-y selector picks a single 1-D x-bilerp of the 0/1 mask, and
  ``floor(. + 0.5)`` of that value equals the mask at the nearest x tap.

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

_NBUF = 3   # stripe DMA ring; _AHEAD planes are prefetched
_AHEAD = 2  # MUST satisfy _AHEAD % _NBUF != 0 and _AHEAD < _NBUF: the
# prefetch issued while processing plane k targets slot (k+_AHEAD)%_NBUF,
# which must be neither the slot being read (k%_NBUF) nor the one already
# in flight -- prefetching k+_NBUF would overwrite the slot the current
# plane's tiles are still reading (a race on hardware; in interpret mode
# the copy lands immediately and every plane reads k+_NBUF's data).


def _pe_inline_rows(x, n_freqs: int):
    """positional_encoding (ops/rays.py:93-104) with channels as ROWS:
    [x, sin(x*2^i) channel-major, cos(x*2^i) channel-major] along axis 0."""
    if n_freqs == 0:
        return x
    sins = jnp.concatenate(
        [jnp.sin(x[c:c + 1] * (2.0 ** i)) for c in range(x.shape[0])
         for i in range(n_freqs)], axis=0)
    coss = jnp.concatenate(
        [jnp.cos(x[c:c + 1] * (2.0 ** i)) for c in range(x.shape[0])
         for i in range(n_freqs)], axis=0)
    return jnp.concatenate([x, sins, coss], axis=0)


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


@functools.partial(jax.jit, static_argnames=("use_bf16",))
def _pack_arrays(density, k0, mask, act_shift4, *, use_bf16: bool):
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
    return packed.reshape(Z, X + padx, (Y + pady) * Cp), act_shift4[0, 0, :, 0]


_pack_cache: list = []  # [(density, k0, mask, use_bf16, result)], len <= 2


def pack_grids_kernel(cfg, params, buffers, *, use_bf16: bool):
    """[Z, X, Y*Cp] flat packed grid for the kernel: density, k0, then the
    free-space mask as a float channel, padded to an 8-multiple channel
    count. Returns (packed_flat, act_shift [Z], Cp, mask_ch, (X, Y)).

    The pack is one jitted dispatch and the result is identity-cached on
    (density, k0, mask_cache) so a video render repacks the ~GB grid once,
    not per frame."""
    density = params["density"]  # [X,Y,Z,1]
    k0 = params["k0"]            # [X,Y,Z,C]
    mask = buffers["mask_cache"]
    for (d0, k00, m0, ub0, res) in _pack_cache:
        if d0 is density and k00 is k0 and m0 is mask and ub0 == use_bf16:
            return res
    packed_flat, act_shift = _pack_arrays(
        density, k0, mask, buffers["act_shift"], use_bf16=use_bf16)
    cp = 1 + k0.shape[-1] + 1
    Cp = cp + ((-cp) % 8)
    X, Y = density.shape[0], density.shape[1]
    res = (packed_flat, act_shift, Cp, cp - 1, (X, Y))
    _pack_cache.insert(0, (density, k0, mask, use_bf16, res))
    del _pack_cache[2:]
    return res


@functools.partial(
    jax.jit,
    static_argnames=("H", "W", "tile", "X", "Y", "Z", "vpe", "inverse_y",
                     "flip_x", "flip_y"),
)
def _prep_groups(K, c2w, xyz_min, xyz_max, *, H: int, W: int, tile,
                 X: int, Y: int, Z: int, vpe: int, inverse_y: bool,
                 flip_x: bool, flip_y: bool):
    """Device-side frame prep in ONE dispatch: rays -> affine (a, b) ->
    column-grouped tiles + viewdir PE, plus two scalar footprint stats
    (max per-tile spread for the fits-the-window check; max per-group
    x-span for the stripe rows). Only the two scalars cross to the host --
    pulling the [H,W,2] maps for a host-side check costs seconds through a
    tunneled device link."""
    from fourk_nerf_tpu.ops import rays as ray_ops
    from fourk_nerf_tpu.ops.plane_sweep import _affine_coeffs

    ro, rd, vd = ray_ops.get_rays_of_a_view(
        H, W, K, c2w, ndc=True, inverse_y=inverse_y, flip_x=flip_x,
        flip_y=flip_y)
    sizes = jnp.asarray([X, Y], dtype=jnp.float32)
    a, b = _affine_coeffs(ro, rd, xyz_min, xyz_max, sizes, Z)

    th, tw = (tile, tile) if isinstance(tile, int) else tile
    ph, pw = (-H) % th, (-W) % tw
    pad2 = lambda x: jnp.pad(x, ((0, ph), (0, pw), (0, 0)), mode="edge")
    a_t, b_t, vd_t = pad2(a), pad2(b), pad2(vd)
    Ht, Wt = H + ph, W + pw
    nty, ntx = Ht // th, Wt // tw

    def groups_of(x):
        # [Ht,Wt,c] -> [ntx groups, nty tiles, th*tw rays, c]: a group is a
        # tile COLUMN (fixed pixel-x range), whose tiles share their grid-x
        # footprint for upright cameras -- the group's x-stripe is DMA'd
        # once per plane and shared. Tiles may be rectangular: SHORT in
        # pixel-y (the VPU-bound y-contraction scales with the y footprint)
        # and wide in pixel-x (keeps rays-per-tile filling the lanes).
        c = x.shape[-1]
        return (x.reshape(nty, th, ntx, tw, c).transpose(2, 0, 1, 3, 4)
                .reshape(ntx, nty, th * tw, c))

    a_g, b_g, vd_g = groups_of(a_t), groups_of(b_t), groups_of(vd_t)
    vd_emb_g = ray_ops.positional_encoding(vd_g, vpe)

    spread_x = jnp.float32(0.0)
    spread_y = jnp.float32(0.0)
    span = jnp.float32(0.0)
    for k_ext in (0.0, float(Z - 1)):
        pk = a_g + b_g * k_ext                      # [nG, G, R, 2]
        d = pk.max(2) - pk.min(2)                   # [nG, G, 2]
        spread_x = jnp.maximum(spread_x, d[..., 0].max())
        spread_y = jnp.maximum(spread_y, d[..., 1].max())
        px = pk[..., 0]                             # [nG, G, R]
        span = jnp.maximum(span, (px.max((1, 2)) - px.min((1, 2))).max())
    return a_g, b_g, vd_emb_g, jnp.stack([spread_x, spread_y, span])


_prep_cache: dict = {}  # pose-keyed; one tunnel round trip per NEW camera


def _prep_groups_cached(K, c2w, cfg, *, H, W, tile, inverse_y, flip_x,
                        flip_y):
    """Pose-keyed cache around :func:`_prep_groups`: repeated renders of the
    same camera (benchmark loops, re-evals) skip both the prep dispatch and
    the stats pull -- each scalar pull costs a full tunnel round trip
    (~35 ms measured)."""
    X, Y, Z = cfg.world_size
    tile = (tile, tile) if isinstance(tile, int) else tuple(tile)
    key = (np.asarray(K).tobytes(), np.asarray(c2w).tobytes(), H, W, tile,
           X, Y, Z, cfg.viewbase_pe, inverse_y, flip_x, flip_y,
           tuple(cfg.xyz_min), tuple(cfg.xyz_max))
    hit = _prep_cache.get(key)
    if hit is not None:
        return hit
    a_g, b_g, vd_emb_g, stats = _prep_groups(
        jnp.asarray(K), jnp.asarray(c2w),
        jnp.asarray(cfg.xyz_min), jnp.asarray(cfg.xyz_max),
        H=H, W=W, tile=tile, X=X, Y=Y, Z=Z, vpe=cfg.viewbase_pe,
        inverse_y=inverse_y, flip_x=flip_x, flip_y=flip_y)
    stats_np = np.asarray(stats)  # ONE pull for all three scalars
    res = (a_g, b_g, vd_emb_g, float(stats_np[0]), float(stats_np[1]),
           float(stats_np[2]))
    if len(_prep_cache) > 8:
        _prep_cache.clear()
    _prep_cache[key] = res
    return res


def _plan_patch(patch_x: int, patch_y: int, X: int, Y: int, Cp: int):
    """Static DMA patch plan: x rows pxs (8-aligned origin snap needs +8
    slack), y taps pys a multiple of ysnap so both the lane offset
    (oy*Cp) and the slice width (pys*Cp) are 128-aligned. The axes size
    independently: pys drives the VPU-bound y-contraction, so it tracks
    the measured per-plane Y footprint, not the (usually larger) X one.
    Returns (pxs, pys, ysnap)."""
    pxs = min(int(math.ceil((patch_x + 8) / 8.0) * 8), X)
    ysnap = 128 // math.gcd(128, Cp)
    need = patch_y + ysnap
    pys = int(math.ceil(need / ysnap) * ysnap)
    if pys > Y:
        pys = Y  # full-dim slice (Y pre-padded to an ysnap multiple)
    return pxs, pys, ysnap


def _block_tree_sum(z, n_blocks: int, Cp: int):
    """Reduce [n_blocks*Cp, R] over the (contiguous, Cp-row) q blocks to
    [Cp, R] with a pairwise tree of static sublane-slice adds -- all
    Mosaic-native, no reshapes."""
    while n_blocks > 1:
        half = n_blocks // 2
        lo = z[:half * Cp, :] + z[half * Cp:2 * half * Cp, :]
        if n_blocks % 2:
            head = lo[:Cp, :] + z[2 * half * Cp:, :]
            # Mosaic rejects zero-size vectors: skip the empty tail at half=1
            lo = head if half == 1 else jnp.concatenate(
                [head, lo[Cp:, :]], axis=0)
        z = lo
        n_blocks = half
    return z


def _row_tree_sum(z, n_rows: int):
    """Reduce [n_rows, R] over rows to [1, R] with a pairwise static tree."""
    while n_rows > 1:
        half = n_rows // 2
        lo = z[:half, :] + z[half:2 * half, :]
        if n_rows % 2:
            head = lo[:1, :] + z[2 * half:, :]
            lo = head if half == 1 else jnp.concatenate([head, lo[1:, :]],
                                                        axis=0)
        z = lo
        n_rows = half
    return z


def _sweep_kernel(a_ref, b_ref, vde_ref, act_ref, *rest,
                  Z: int, X: int, Y: int, Xl: int, Yl: int, Cp: int,
                  G: int, pxs: int, pxs_g: int, pys: int, ysnap: int,
                  mask_ch: int, k0_dim: int, n_layers: int, interval: float,
                  fast_thres: float, spatial_pe: int, act, early_exit: bool,
                  compute_dtype, precision, ablate: str = ""):
    """One program per TILE GROUP (a column of G tiles sharing their grid-x
    footprint). Per depth plane the group's x-stripe is DMA'd from HBM ONCE
    and all G tiles read their windows out of VMEM -- G independent per-tile
    chains also overlap in the hardware pipelines, hiding the per-plane
    vector-op latency that binds a one-tile-per-program kernel."""
    mlp_refs = rest[:2 * n_layers]
    (packed_ref, rgb_ref, depth_ref, ail_ref,
     stripe_sc, kout_sc, sem) = rest[2 * n_layers:]

    R = a_ref.shape[-1]
    f32 = jnp.float32
    big = jnp.float32(1e9)

    # --- init accumulators (outputs are VMEM-resident for the program) -----
    rgb_ref[0] = jnp.zeros((G, 3, R), f32)
    depth_ref[0] = jnp.zeros((G, 1, R), f32)
    ail_ref[0] = jnp.ones((G, 1, R), f32)

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

    # --- pre-pass over tiles: per-ray in-bounds plane intervals (a ray is
    # inside [0, dim-1] on one contiguous k range since pos is linear in k),
    # the group's entry plane, and the group chord-x endpoints for the
    # stripe DMA origin -------------------------------------------------
    def prep(g, carry):
        k_start_f, x0g, x1g = carry
        a_g = a_ref[0, g]  # [2,R]
        b_g = b_ref[0, g]
        ax, ay = a_g[0:1, :], a_g[1:2, :]
        bx, by = b_g[0:1, :], b_g[1:2, :]
        lox, hix = axis_interval(ax, bx, jnp.float32(Xl - 1))
        loy, hiy = axis_interval(ay, by, jnp.float32(Yl - 1))
        k_in = jnp.maximum(lox, loy)   # [1,R]
        k_out = jnp.minimum(hix, hiy)  # [1,R]
        kout_sc[g] = k_out
        k_start_f = jnp.minimum(
            k_start_f, jnp.min(jnp.where(k_in <= k_out, k_in, big)))
        # chord endpoints: per-plane min over rays is CONCAVE in k (min of
        # linear fns) so it lies on/above the chord -- a chord origin always
        # covers the footprint given the stripe sizing + snap slack
        x0g = jnp.minimum(x0g, jnp.min(ax))
        x1g = jnp.minimum(x1g, jnp.min(ax + bx * (Z - 1)))
        return k_start_f, x0g, x1g

    k_start_f, x0g, x1g = jax.lax.fori_loop(0, G, prep, (big, big, big))
    k_start = jnp.clip(jnp.floor(k_start_f).astype(jnp.int32), 0, Z - 1)

    def stripe_origin(k):
        f = k.astype(f32) / max(Z - 1, 1)
        cx = x0g * (1.0 - f) + x1g * f
        ox = jnp.clip((jnp.floor(cx).astype(jnp.int32) - 1) // 8 * 8,
                      0, X - pxs_g)
        return ox

    def start_dma(slot, k):
        # one CONTIGUOUS x-stripe per plane per GROUP ([k, ox:ox+pxs_g, :]
        # is a single flat block of the [Z, Xp, Yp*Cp] array), shared by all
        # G tiles: per-tile patch DMAs (pxs strided ~2KB rows each) are
        # descriptor-rate-bound and re-fetch overlapping voxels G times over
        ox = pl.multiple_of(stripe_origin(k), 8)
        pltpu.make_async_copy(
            packed_ref.at[k, pl.ds(ox, pxs_g)],
            stripe_sc.at[slot], sem.at[slot],
        ).start()

    def wait_dma(slot):
        pltpu.make_async_copy(
            stripe_sc.at[slot], stripe_sc.at[slot], sem.at[slot]).wait()

    if not early_exit:
        k_start = jnp.int32(0)
    for off in range(min(_AHEAD, Z)):
        @pl.when(k_start + off < Z)
        def _(off=off):
            start_dma((k_start + off) % _NBUF, k_start + off)

    # Mosaic iota must be integer; cast after. Taps live on ROWS.
    xtaps = jax.lax.broadcasted_iota(jnp.int32, (pxs, 1), 0).astype(f32)
    ytaps = jax.lax.broadcasted_iota(jnp.int32, (pys, 1), 0).astype(f32)

    def tile_step(g, k, kf, slot, oxs):
        a_g = a_ref[0, g]
        b_g = b_ref[0, g]
        pos_x = a_g[0:1, :] + b_g[0:1, :] * kf   # [1,R]
        pos_y = a_g[1:2, :] + b_g[1:2, :] * kf

        # per-tile windows out of the VMEM stripe (origins snapped to the
        # (8, 128) tiling; the stripe origin is snapped the same way and the
        # group chord-min <= every tile min, so offsets are non-negative)
        ox = jnp.clip((jnp.floor(jnp.min(pos_x)).astype(jnp.int32) - 1)
                      // 8 * 8, oxs, oxs + pxs_g - pxs)
        oy = jnp.clip((jnp.floor(jnp.min(pos_y)).astype(jnp.int32) - 1)
                      // ysnap * ysnap, 0, Y - pys)
        dx_off = pl.multiple_of(ox - oxs, 8)
        oyc = pl.multiple_of(oy * Cp, 128)
        patch_v = stripe_sc[slot, pl.ds(dx_off, pxs), pl.ds(oyc, pys * Cp)]

        dxw = (pos_x - ox.astype(f32)) - xtaps
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(dxw)).astype(compute_dtype)
        dyw = (pos_y - oy.astype(f32)) - ytaps
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(dyw))  # [pys,R] f32

        # x interpolation on the MXU, contracting the x-tap dim of both
        # operands: tmp[q*Cp+c, r] = sum_p patch[p, q*Cp+c] * wx[p, r]
        if "lok" in ablate:  # perf ablation: K=8 matmul (keeps DMA live)
            tmp = jax.lax.dot_general(
                patch_v[0:8].astype(compute_dtype), wx[0:8],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
        else:
            tmp = jax.lax.dot_general(
                patch_v.astype(compute_dtype), wx,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )  # [pys*Cp, R] f32

        # y-contraction: broadcast multiply (one pass over tmp) + pairwise
        # block-tree adds. The mask channel is handled separately below.
        if "noy" in ablate:
            samp = tmp[:Cp, :] * wy[0:1, :]
        else:
            z = (tmp.reshape(pys, Cp, R) * wy.reshape(pys, 1, R)).reshape(
                pys * Cp, R)
            samp = _block_tree_sum(z, pys, Cp)   # [Cp,R] f32

        # exact nearest-neighbor mask: the one-hot nearest-y selector picks
        # a single 1-D x-bilerp of the 0/1 mask; floor(+0.5) of THAT value
        # is the mask at the nearest x tap (snap-after == snap-before
        # because the selector is one-hot)
        if "nomask" in ablate:
            mval = jnp.ones((1, R), f32)
        else:
            wyn = jnp.floor(wy + 0.5)                       # [pys,R]
            tmp_m = tmp.reshape(pys, Cp, R)[:, mask_ch, :]  # [pys,R]
            mval = jnp.floor(_row_tree_sum(tmp_m * wyn, pys) + 0.5)

        t_cum = ail_ref[0, g]  # [1,R]
        density = samp[0:1, :]
        shift_k = act_ref[0, k]
        alpha = 1.0 - jnp.exp(-jax.nn.softplus(density + shift_k) * interval)
        inb = ((pos_x >= 0) & (pos_x <= Xl - 1)
               & (pos_y >= 0) & (pos_y <= Yl - 1))
        alpha = jnp.where(inb & (mval > 0.5), alpha, 0.0)
        if fast_thres > 0:
            alpha = jnp.where(alpha > fast_thres, alpha, 0.0)
        alive = t_cum >= render.EARLY_TERM_THRES
        alpha = jnp.where(alive, alpha, 0.0)

        def mlp_and_composite():
            # rgbnet MLP on the MXU, rays staying on the lanes
            if "nomlp" in ablate:
                rgb_raw = jnp.concatenate([samp[1:2, :]] * 3, axis=0)
            else:
                pe_spa = jnp.concatenate([
                    jnp.full((1, R), 2.0 * kf / max(Z - 1, 1) - 1.0,
                             dtype=f32),
                    pos_y / (Yl - 1) * 2.0 - 1.0,
                    pos_x / (Xl - 1) * 2.0 - 1.0,
                ], axis=0)
                pe_emb = _pe_inline_rows(pe_spa, spatial_pe)
                h = jnp.concatenate(
                    [samp[1:1 + k0_dim, :], pe_emb, vde_ref[0, g]],
                    axis=0).astype(compute_dtype)
                for li in range(n_layers):
                    w = mlp_refs[2 * li][...]       # [Cin, width]
                    bb = mlp_refs[2 * li + 1][...]  # [width, 1]
                    h = jax.lax.dot_general(
                        w.astype(compute_dtype), h,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=precision,
                    ) + bb.astype(jnp.float32)
                    if li < n_layers - 1:
                        h = act(h).astype(compute_dtype)
                rgb_raw = jax.nn.sigmoid(h)  # [3,R]

            w_comp = t_cum * alpha
            if fast_thres > 0:
                w_comp = jnp.where(w_comp > fast_thres, w_comp, 0.0)
            rgb_ref[0, g] = rgb_ref[0, g] + w_comp * rgb_raw
            depth_ref[0, g] = depth_ref[0, g] + w_comp * ((kf + 0.5) / Z)
            ail_ref[0, g] = t_cum * (1.0 - alpha)

        # plane-granular sample compaction (VERDICT r4 item 6, the
        # survivor-compaction the reference CUDA path does dynamically,
        # /root/reference/lib/dmpigo.py:309-333, lifted to (tile, plane)
        # granularity): when EVERY ray's thresholded alpha is zero -- empty
        # space, masked voxels, or out-of-frustum -- the MLP, the composite,
        # and the transmittance update are all exact no-ops
        # (ail = t_cum * (1 - 0) = t_cum), so skip them wholesale. On
        # trained grids most (tile, plane) pairs are empty; random
        # synthetic grids skip little. "noskip" ablates back to
        # unconditional execution for measurement.
        if "noskip" in ablate:
            mlp_and_composite()
        else:
            @pl.when(jnp.max(alpha) > 0.0)
            def _():
                mlp_and_composite()

    def plane_step(k):
        slot = k % _NBUF
        kf = k.astype(f32)
        wait_dma(slot)
        oxs = pl.multiple_of(stripe_origin(k), 8)

        # prefetch plane k+_AHEAD into a slot that is neither the one being
        # read (k%_NBUF) nor the in-flight one ((k+1)%_NBUF)
        @pl.when(k + _AHEAD < Z)
        def _():
            start_dma((k + _AHEAD) % _NBUF, k + _AHEAD)

        def tile_body(g, alive_next):
            if early_exit:
                # skip saturated/frustum-exited tiles entirely (the
                # reference's per-ray break, render_utils_kernel.cu:596-600,
                # lifted to tile granularity)
                t_cum = ail_ref[0, g]
                live = jnp.where(kf <= kout_sc[g], t_cum, 0.0)

                @pl.when(jnp.max(live) >= render.EARLY_TERM_THRES)
                def _():
                    tile_step(g, k, kf, slot, oxs)
            else:
                tile_step(g, k, kf, slot, oxs)
            live_n = jnp.where(kf + 1.0 <= kout_sc[g], ail_ref[0, g], 0.0)
            return jnp.maximum(alive_next, jnp.max(live_n))

        return jax.lax.fori_loop(0, G, tile_body, jnp.float32(0.0))

    if early_exit:
        def cond(state):
            k, alive_any = state
            return (k < Z) & (alive_any >= render.EARLY_TERM_THRES)

        def wbody(state):
            k, _ = state
            return k + 1, plane_step(k)

        k_exit, _ = jax.lax.while_loop(cond, wbody, (k_start, jnp.float32(1.0)))
        # drain in-flight DMAs on early exit: the scratch semaphores persist
        # into the next grid program, so leftover signals would corrupt its
        # waits. Issued-but-unawaited planes are k_exit .. k_exit+_AHEAD-1.
        for off in range(_AHEAD):
            @pl.when(k_exit + off < Z)
            def _(off=off):
                wait_dma((k_exit + off) % _NBUF)
    else:
        def fbody(k, _):
            return plane_step(k)

        jax.lax.fori_loop(0, Z, fbody, jnp.float32(0.0))


@functools.partial(
    jax.jit,
    static_argnames=("Y", "Xl", "Yl", "Cp", "pxs", "pxs_g", "pys", "ysnap",
                     "mask_ch", "k0_dim", "interval", "fast_thres",
                     "spatial_pe", "act", "early_exit", "use_bf16",
                     "interpret", "ablate"),
)
def sweep_tiles_pallas(packed_flat, act_shift, a_tiles, b_tiles,
                       vd_emb_tiles, mlp_flat, *, Y: int, Xl: int, Yl: int,
                       Cp: int, pxs: int, pxs_g: int, pys: int, ysnap: int,
                       mask_ch: int, k0_dim: int, interval: float,
                       fast_thres: float, spatial_pe: int, act,
                       early_exit: bool = True, use_bf16: bool = True,
                       interpret: bool = False, ablate: str = ""):
    """Run the fused kernel over all tile groups.

    packed_flat: [Z, Xp, Yp*Cp] from :func:`pack_grids_kernel` (padded dims;
    Xl/Yl are the logical grid dims); a/b_tiles: [nG, G, R, 2] with the G
    axis a tile COLUMN (shared grid-x footprint); vd_emb_tiles: [nG,G,R,E];
    mlp_flat: flat tuple (w0,b0,w1,b1,...) with biases [1,W].
    Returns (rgb [nG,G,R,3], depth [nG,G,R], alphainv_last [nG,G,R]).
    """
    Z, X, _ = packed_flat.shape
    nG, G, R, _ = a_tiles.shape
    n_layers = len(mlp_flat) // 2
    compute_dtype = jnp.bfloat16 if use_bf16 else jnp.float32
    # f32 path = parity/metrics path: force true-f32 MXU passes (TPU matmul
    # default precision is bf16-grade even on f32 operands)
    precision = None if use_bf16 else jax.lax.Precision.HIGHEST

    # transpose to rays-as-lanes [nG, G, c, R]; biases to [W, 1]
    a_t = jnp.swapaxes(a_tiles, 2, 3)
    b_t = jnp.swapaxes(b_tiles, 2, 3)
    vde_t = jnp.swapaxes(vd_emb_tiles, 2, 3)
    mlp_t = []
    for li in range(n_layers):
        mlp_t.append(mlp_flat[2 * li])                       # [Cin, W]
        mlp_t.append(mlp_flat[2 * li + 1].reshape(-1, 1))    # [W, 1]

    kernel = functools.partial(
        _sweep_kernel, Z=Z, X=X, Y=Y, Xl=Xl, Yl=Yl, Cp=Cp, G=G, pxs=pxs,
        pxs_g=pxs_g, pys=pys, ysnap=ysnap, mask_ch=mask_ch, k0_dim=k0_dim,
        n_layers=n_layers, interval=interval, fast_thres=fast_thres,
        spatial_pe=spatial_pe, act=act, early_exit=early_exit,
        compute_dtype=compute_dtype, precision=precision, ablate=ablate,
    )

    group_block = lambda c: pl.BlockSpec((1, G, c, R), lambda t: (t, 0, 0, 0),
                                         memory_space=pltpu.VMEM)
    mlp_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in mlp_t]

    rgb, depth, ail = pl.pallas_call(
        kernel,
        grid=(nG,),
        in_specs=[
            group_block(2),  # a
            group_block(2),  # b
            group_block(vde_t.shape[2]),  # viewdir PE
            pl.BlockSpec(memory_space=pltpu.SMEM),  # act_shift [1,Z]
            *mlp_specs,
            # the grid stays in HBM; per-plane stripes are DMA'd manually
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=(
            group_block(3),
            group_block(1),
            group_block(1),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nG, G, 3, R), jnp.float32),
            jax.ShapeDtypeStruct((nG, G, 1, R), jnp.float32),
            jax.ShapeDtypeStruct((nG, G, 1, R), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((_NBUF, pxs_g, packed_flat.shape[2]), packed_flat.dtype),
            pltpu.VMEM((G, 1, R), jnp.float32),  # per-tile k_out
            pltpu.SemaphoreType.DMA((_NBUF,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(a_t, b_t, vde_t, act_shift.reshape(1, -1), *mlp_t, packed_flat)
    return (jnp.swapaxes(rgb, 2, 3), depth[:, :, 0, :], ail[:, :, 0, :])


def render_frame_pallas(cfg, params, buffers, H: int, W: int, K, c2w, *,
                        stepsize: float, bg: float, tile=None,
                        patch: int | None = None, inverse_y=False,
                        flip_x=False, flip_y=False, use_bf16: bool = True,
                        early_exit: bool = True, interpret: bool = False,
                        ablate: str = ""):
    """Full-frame render through the fused Pallas kernel. Same contract as
    :func:`fourk_nerf_tpu.ops.plane_sweep.render_frame` (plane-aligned NDC
    conditions required; ValueError when the footprint exceeds the patch).

    tile=None selects (32, 128), the production tiling. Round 5 demoted
    the short-lived (8, 512) auto-default (profile_r4/encoder_ablation.md
    measured it -3.2% once): re-measured in one process it is a wash
    (284.9 vs 279.6 ms median at fern scale, tools/perf/diag_r5.py), its
    Mosaic compile takes 171 s vs 6.5 s, and it overflows the 100 MB
    scoped-VMEM budget whenever viewbase_pe > 0 widens the viewdir
    embedding (the round-4 trained-anchor JaxRuntimeError: scoped
    allocation 116.2 MB). Callers can still pass (8, 512) explicitly."""
    from fourk_nerf_tpu.models import common, dmpigo
    from fourk_nerf_tpu.ops import plane_sweep, rays as ray_ops

    assert dmpigo.plane_aligned_ok(cfg, stepsize, ndc=True)
    X, Y, Z = cfg.world_size
    if tile is None:
        tile = (32, 128)
    th, tw = (tile, tile) if isinstance(tile, int) else tuple(tile)

    # ALL frame prep runs on device in one dispatch; the host pulls exactly
    # TWO scalars (footprint spread + group span). Pulling the [H,W,2]
    # affine maps for a host-side check costs seconds through a tunneled
    # device link (measured ~5 s for 12 MB on axon) and used to dominate
    # the whole frame time.
    a_g, b_g, vd_emb_g, spread_x, spread_y, span = _prep_groups_cached(
        K, c2w, cfg, H=H, W=W, tile=tile,
        inverse_y=inverse_y, flip_x=flip_x, flip_y=flip_y)
    if patch is None:
        # auto-size both windows from the measured footprint; refuse only
        # when the window would blow the VMEM budget
        patch = int(math.ceil(max(spread_x, spread_y))) + 3
        if patch > 256:
            raise ValueError(f"tile footprint {patch - 3} too large")
    if max(spread_x, spread_y) > patch - 3:
        raise ValueError(
            f"tile footprint {max(spread_x, spread_y)} exceeds patch {patch}")
    # the Y window is auto-sized from the measured per-plane Y footprint
    patch_y = min(patch, int(math.ceil(spread_y)) + 3)
    ph, pw = (-H) % th, (-W) % tw
    Ht, Wt = H + ph, W + pw
    nty, ntx = Ht // th, Wt // tw

    packed_flat, act_shift, Cp, mask_ch, (Xl, Yl) = pack_grids_kernel(
        cfg, params, buffers, use_bf16=use_bf16)
    Xp = packed_flat.shape[1]
    Yp = packed_flat.shape[2] // Cp
    pxs, pys, ysnap = _plan_patch(patch, patch_y, Xp, Yp, Cp)

    # group stripe rows: the largest x-span of any group at the k extremes
    # (per-plane group min/max are concave/convex in k, so extremes bound
    # mid-k spans), plus the per-tile window and snap slack
    pxs_g = min(int(np.ceil((span + 4) / 8.0) * 8) + 8 + pxs, Xp)

    mlp_flat = []
    mlp = params["rgbnet"]
    for li in range(len(mlp) // 2):
        mlp_flat.append(mlp[f"w{li}"])
        mlp_flat.append(mlp[f"b{li}"].reshape(1, -1))

    interval = float(stepsize * cfg.voxel_size_ratio)
    act = common.activation(cfg.act_type)
    rgb, depth, ail = sweep_tiles_pallas(
        packed_flat, act_shift, a_g, b_g, vd_emb_g,
        tuple(mlp_flat), Y=Yp, Xl=Xl, Yl=Yl, Cp=Cp, pxs=pxs, pxs_g=pxs_g,
        pys=pys, ysnap=ysnap, mask_ch=mask_ch, k0_dim=cfg.k0_dim,
        interval=interval, fast_thres=float(cfg.fast_color_thres),
        spatial_pe=cfg.spatial_pe, act=act, early_exit=early_exit,
        use_bf16=use_bf16, interpret=interpret, ablate=ablate,
    )
    # single-dispatch assembly: the ungroup/blend used to run as ~20 eager
    # ops, each a full tunnel round trip (profiled ~60 ms/frame)
    f, m, d, a = _assemble(rgb, depth, ail, jnp.float32(bg),
                           th=th, tw=tw, Ht=Ht, Wt=Wt, H=H, W=W)
    return {"rgb_marched": m, "rgb_feature": f, "depth": d,
            "alphainv_last": a}


@functools.partial(jax.jit,
                   static_argnames=("th", "tw", "Ht", "Wt", "H", "W"))
def _assemble(rgb, depth, ail, bg, *, th, tw, Ht, Wt, H, W):
    nty, ntx = Ht // th, Wt // tw

    def ungroup(x):
        c = x.shape[-1] if x.ndim == 4 else 1
        x = x.reshape(ntx, nty, th, tw, c).transpose(1, 2, 0, 3, 4)
        return x.reshape(Ht, Wt, c)[:H, :W]

    feat = ungroup(rgb)
    a = ungroup(ail)
    return (feat, feat + a * bg, ungroup(depth)[..., 0], a[..., 0])

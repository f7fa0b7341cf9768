"""Pallas fused bounded-scene slab-sweep renderer (DirectVoxGO class).

TPU-native replacement for the reference's fused CUDA bounded-scene pipeline
(sample_pts_on_rays + raw2alpha + alpha2weight + F.grid_sample,
/root/reference/lib/cuda/render_utils_kernel.cu:144-707): the XLA slab sweep
(ops/box_sweep.py) already replaces the gathers with plane-pair streaming +
hat-weight matmuls, but XLA materializes every per-sample intermediate in HBM
(measured: ablation 'nointerp' == full at 5.2 s/frame -- the frame is
HBM-bound on [T,R,S,*] temporaries, not compute).  This kernel keeps the
whole working set in VMEM:

- ONE grid axis is swept slab by slab (see box_sweep docstring for the
  dominant-axis/S-slot construction; the same prep feeds both paths).  A
  slab needs the plane PAIR (j, j+1): with an _NBUF=3 DMA ring both are
  resident by construction (slots j%3 and (j+1)%3) while plane j+2
  prefetches into the free slot -- each plane crosses HBM once per program.
  At bounded-scene grid sizes a full plane is small (160^2*16ch bf16 =
  819 KB), so programs DMA whole planes: no stripes, no grouping geometry.
- SLOTS ARE LANES: a tile's R rays x S slab-slots flatten to S*R lanes
  (s-major), per-ray affines broadcast by lane-concat.  The u-interpolation
  is one MXU ``dot_general`` per resident plane
  (``window[pus, pvs*Cp] x wu[pus, S*R] -> [pvs*Cp, S*R]``), the
  v-contraction is a broadcast multiply + pairwise block-tree of sublane
  adds, and the 2-tap z blend closes the trilinear product.  Window origins
  come from an in-kernel masked min over the tile's valid lanes -- no
  footprint arrays cross to the kernel.
- WORK SKIPPING, the reason this beats the XLA sweep: (1) each tile carries
  a precomputed occupied-slab interval [j_lo, j_hi] (XLA prep pools the
  free-space mask over slab pairs and window-sized blocks; SMEM scalars) --
  empty space before/after the shell is never touched; (2) saturated tiles
  (all rays' transmittance < 1e-3, render_utils_kernel.cu:596-600) skip
  their remaining slabs and the program exits when every tile is done;
  (3) slabs whose composite weights are all zero skip the MLP entirely --
  ``lax.cond``-style real branches XLA's masked scan cannot express.

The free-space mask rides as a packed channel with exact per-axis snapped
nearest-neighbor semantics (maskcache_lookup, render_utils_kernel.cu:367-424)
-- the kernel REQUIRES mask resolution == grid resolution (the production
case; callers fall back to the XLA slab sweep otherwise).

Numerics (use_bf16=False) match ops/box_sweep.render_frame_box up to
nearest-boundary ties (the kernel evaluates grid positions from the per-ray
affine instead of the world-point chain); parity-tested in
tests/test_pallas_box.py, on-chip f32 check in tools/perf/parity_on_chip.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fourk_nerf_tpu.ops import render, rays as ray_ops
from fourk_nerf_tpu.ops.box_sweep import (
    _EPSK, _S_MAX, _axis_stats, _perm, _round_up8, _tiles_of)
from fourk_nerf_tpu.ops.pallas_sweep import _block_tree_sum, _row_tree_sum

_NBUF = 3  # plane ring: slab j reads slots j%3,(j+1)%3; j+2 prefetches


# ---------------------------------------------------------------------------
# packing (identity-cached: video renders repack the grid once per axis)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("axis", "flip", "use_bf16"))
def _pack_flat(density, k0, mask, *, axis: int, flip: bool, use_bf16: bool):
    p = _perm(axis)
    packed = jnp.concatenate(
        [density, k0, mask.astype(density.dtype)[..., None]], axis=-1)
    cp = packed.shape[-1]
    pad = (-cp) % 8
    if pad:
        packed = jnp.pad(packed, ((0, 0),) * 3 + ((0, pad),))
    Cp = cp + pad
    packed = jnp.transpose(packed, p + (3,))  # [Z,U,V,Cp]
    if flip:
        packed = packed[::-1]
    if use_bf16:
        packed = packed.astype(jnp.bfloat16)
    Z, U, V, _ = packed.shape
    vsnap = 128 // math.gcd(128, Cp)
    padu = (-U) % 8
    padv = (-V) % vsnap
    if padu or padv:
        packed = jnp.pad(packed, ((0, 0), (0, padu), (0, padv), (0, 0)))
    return packed.reshape(Z, U + padu, (V + padv) * Cp)


_pack_cache: list = []


def pack_box_kernel(cfg, params, buffers, *, axis: int, flip: bool,
                    use_bf16: bool):
    density = params["density"]
    k0 = params["k0"]
    mask = buffers["mask_cache"]
    key = (density, k0, mask, axis, flip, use_bf16)
    for (k, res) in _pack_cache:
        if all(a is b if isinstance(a, jax.Array) else a == b
               for a, b in zip(k, key)):
            return res
    flat = _pack_flat(density, k0, mask, axis=axis, flip=flip,
                      use_bf16=use_bf16)
    cp = 1 + k0.shape[-1] + 1
    Cp = cp + ((-cp) % 8)
    res = (flat, Cp, cp - 1)
    _pack_cache.insert(0, (key, res))
    del _pack_cache[2:]
    return res


# ---------------------------------------------------------------------------
# frame prep (one dispatch; pulls [2] spread floats)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=(
    "cfg", "H", "W", "tile", "axis", "flip", "stepsize", "near",
    "inverse_y", "flip_x", "flip_y", "vpe", "block"))
def _prep_box(cfg, Kc, c2w, mask, *, H: int, W: int, tile: int, axis: int,
              flip: bool, stepsize: float, near: float, inverse_y: bool,
              flip_x: bool, flip_y: bool, vpe: int, block: int = 8):
    """Rays -> per-tile lane-major constants [T, 8, R], viewdir PE [T, E, R],
    per-tile occupied-slab intervals [2, T] (from the pooled free-space
    mask), and the footprint spread [2] (the only host pull)."""
    p = _perm(axis)
    Z, U, V = [cfg.world_size[i] for i in p]
    stepdist = stepsize * cfg.voxel_size
    K = cfg.n_samples(stepsize)
    mn_all = jnp.asarray(cfg.xyz_min)
    mx_all = jnp.asarray(cfg.xyz_max)

    ro, rd, vd = ray_ops.get_rays_of_a_view(
        H, W, Kc, c2w, ndc=False, inverse_y=inverse_y, flip_x=flip_x,
        flip_y=flip_y)
    ph, pw = (-H) % tile, (-W) % tile
    pad2 = lambda x: jnp.pad(x, ((0, ph), (0, pw), (0, 0)), mode="edge")
    nty, ntx = (H + ph) // tile, (W + pw) // tile
    ro_t = _tiles_of(pad2(ro), nty, ntx, tile)   # [T,R,3]
    rd_t = _tiles_of(pad2(rd), nty, ntx, tile)
    vd_t = _tiles_of(pad2(vd), nty, ntx, tile)

    t_min, t_max = render.ray_aabb(ro_t, rd_t, mn_all, mx_all, near, 1e9)
    hit_fp = t_max > t_min
    rnorm = jnp.linalg.norm(rd_t, axis=-1)
    n_per = jnp.maximum(jnp.ceil((t_max - t_min) * rnorm / stepdist), 1.0)
    start = ro_t + rd_t * t_min[..., None]
    unit = rd_t / rnorm[..., None]
    vde = ray_ops.positional_encoding(vd_t, vpe) if vpe else vd_t

    pl_ = list(p)
    start_p = start[..., pl_]
    unit_p = unit[..., pl_]
    mn = mn_all[jnp.asarray(pl_)]
    mx = mx_all[jnp.asarray(pl_)]
    sz = jnp.asarray([Z, U, V], jnp.float32)
    aff0 = (start_p - mn) / (mx - mn) * (sz - 1.0)
    dk = unit_p * stepdist / (mx - mn) * (sz - 1.0)
    z0, dz = aff0[..., 0], dk[..., 0]
    if flip:
        z0 = (Z - 1) - z0
        dz = -dz
    dz = jnp.where(jnp.abs(dz) < 1e-8, 1e-8, dz)
    u0, du = aff0[..., 1], dk[..., 1]
    v0, dv = aff0[..., 2], dk[..., 2]
    kmax = jnp.minimum(n_per - 1.0, float(K - 1))
    consts = jnp.stack(
        [u0, du, v0, dv, z0, dz, kmax, jnp.zeros_like(u0)], axis=1)  # [T,8,R]

    # footprint windows + spread (same construction as box_sweep._prep_frame)
    def body(_, j):
        ka_r = (j - z0) / dz
        kb_r = (j + 1.0 - z0) / dz
        ka = jnp.clip(jnp.ceil(ka_r - _EPSK), 0.0, kmax)
        kb = jnp.clip(kb_r, 0.0, kmax)
        active = hit_fp & (jnp.minimum(kb_r, kmax + 1.0)
                           >= jnp.maximum(ka_r, 0.0) - 0.5)
        ulo = jnp.minimum(u0 + du * ka, u0 + du * kb)
        uhi = jnp.maximum(u0 + du * ka, u0 + du * kb)
        vlo = jnp.minimum(v0 + dv * ka, v0 + dv * kb)
        vhi = jnp.maximum(v0 + dv * ka, v0 + dv * kb)
        big = jnp.float32(3e8)
        wmin = jnp.stack([
            jnp.min(jnp.where(active, ulo, big), axis=1),
            jnp.min(jnp.where(active, vlo, big), axis=1)], axis=-1)
        wmax = jnp.stack([
            jnp.max(jnp.where(active, uhi, -big), axis=1),
            jnp.max(jnp.where(active, vhi, -big), axis=1)], axis=-1)
        return None, (wmin, wmax)

    js = jnp.arange(Z - 1, dtype=jnp.float32)
    _, (wmin, wmax) = jax.lax.scan(body, None, js)  # [Z-1,T,2]
    spread = jnp.max(jnp.clip(wmax - wmin, 0.0, None), axis=(0, 1))
    return consts, vde, wmin, wmax, jnp.any(hit_fp, axis=1), spread


@functools.partial(jax.jit, static_argnames=(
    "axis", "flip", "Z", "block", "ndil"))
def _occ_intervals(mask, wmin, wmax, hit_any, *, axis: int, flip: bool,
                   Z: int, block: int, ndil: int):
    """Per-tile occupied-slab intervals [2, T]: pool the 0/1 free-space mask
    over slab pairs and (block x block) blocks, dilate by the (static,
    spread-derived) window radius, and read at each tile's per-slab window
    CENTER block.  Conservative superset of 'any unmasked voxel within one
    cell of the tile's slab-j interpolation window' -- false positives only
    cost speed; the radius is sized so false negatives cannot occur."""
    p = _perm(axis)
    m_a = jnp.transpose(mask, p)
    if flip:
        m_a = m_a[::-1]
    pair = (m_a[:-1] | m_a[1:]).astype(jnp.float32)  # [Z-1,U,V]
    pooled = jax.lax.reduce_window(
        pair, 0.0, jax.lax.max, (1, block, block), (1, block, block),
        "SAME")
    width = 2 * ndil + 1
    dil = jax.lax.reduce_window(
        pooled, 0.0, jax.lax.max, (1, width, width), (1, 1, 1), "SAME")
    wc = (wmin + wmax) * 0.5
    bu = jnp.clip(jnp.floor(wc[..., 0]).astype(jnp.int32) // block,
                  0, dil.shape[1] - 1)  # [Z-1,T]
    bv = jnp.clip(jnp.floor(wc[..., 1]).astype(jnp.int32) // block,
                  0, dil.shape[2] - 1)
    jj = jnp.broadcast_to(jnp.arange(Z - 1)[:, None], bu.shape)
    occ = (dil[jj, bu, bv] > 0.5) & hit_any[None, :]  # [Z-1,T]
    any_occ = jnp.any(occ, axis=0)
    j_lo = jnp.where(any_occ, jnp.argmax(occ, axis=0), Z)
    j_hi = jnp.where(any_occ,
                     (Z - 2) - jnp.argmax(occ[::-1], axis=0), -1)
    return jnp.stack([j_lo, j_hi]).astype(jnp.int32)  # [2,T]


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _box_kernel(consts_ref, vde_ref, jlo_ref, jhi_ref, *rest,
                Z: int, Ul: int, Vl: int, Cp: int, TG: int, S: int,
                pus: int, pvs: int, vsnap: int, mask_ch: int, k0_dim: int,
                n_layers: int, act_shift: float, interval: float,
                fast_thres: float, n_ref: int, K: int, rgb_direct: bool,
                act, early_exit: bool, compute_dtype, precision):
    mlp_refs = rest[:2 * n_layers]
    (packed_ref, rgb_ref, depth_ref, ail_ref, planes_sc, sem) = \
        rest[2 * n_layers:]

    R = consts_ref.shape[-1]
    SR = S * R
    f32 = jnp.float32
    Up = planes_sc.shape[1]

    rgb_ref[...] = jnp.concatenate(
        [jnp.zeros((TG, 3, R), f32), jnp.ones((TG, 1, R), f32)], axis=1)
    depth_ref[...] = jnp.zeros((TG, 1, R), f32)
    ail_ref[...] = jnp.ones((TG, 1, R), f32)

    # group slab range from the per-tile intervals (SMEM scalars)
    def jminmax(t, carry):
        lo, hi = carry
        return (jnp.minimum(lo, jlo_ref[0, t]),
                jnp.maximum(hi, jhi_ref[0, t]))

    j0g, jhg = jax.lax.fori_loop(0, TG, jminmax, (jnp.int32(Z), jnp.int32(-1)))
    j0g = jnp.clip(j0g, 0, Z - 2)

    def start_dma(slot, k):
        pltpu.make_async_copy(
            packed_ref.at[k], planes_sc.at[slot], sem.at[slot]).start()

    def wait_dma(slot):
        pltpu.make_async_copy(
            planes_sc.at[slot], planes_sc.at[slot], sem.at[slot]).wait()

    utaps = jax.lax.broadcasted_iota(jnp.int32, (pus, 1), 0).astype(f32)
    vtaps = jax.lax.broadcasted_iota(jnp.int32, (pvs, 1), 0).astype(f32)

    def rep(x):  # [1,R] -> [1,S*R], s-major lanes
        return jnp.concatenate([x] * S, axis=1)

    def tile_step(t, j, jf, slotA, slotB):
        c = consts_ref[t]  # [8,R]
        u0, du = c[0:1, :], c[1:2, :]
        v0, dv = c[2:3, :], c[3:4, :]
        z0, dz = c[4:5, :], c[5:6, :]
        kmax = c[6:7, :]

        k_lo = jnp.clip(jnp.ceil((jf - z0) / dz - _EPSK), 0.0, kmax)  # [1,R]
        ks = jnp.concatenate(
            [k_lo + float(s) for s in range(S)], axis=1)  # [1,SR]
        u = rep(u0) + rep(du) * ks
        v = rep(v0) + rep(dv) * ks
        z = rep(z0) + rep(dz) * ks
        member = jnp.clip(jnp.floor(z), 0.0, float(Z - 2)) == jf
        valid = (member & (ks < rep(kmax) + 0.5)
                 & (u >= 0.0) & (u <= Ul - 1.0)
                 & (v >= 0.0) & (v <= Vl - 1.0)
                 & (z >= 0.0) & (z <= Z - 1.0))
        vmask = valid.astype(f32)

        @pl.when(jnp.max(vmask) > 0.0)
        def _():
            big = jnp.float32(1e9)
            ou = jnp.clip(
                (jnp.floor(jnp.min(jnp.where(valid, u, big)))
                 .astype(jnp.int32) - 1) // 8 * 8, 0, Up - pus)
            ov = jnp.clip(
                (jnp.floor(jnp.min(jnp.where(valid, v, big)))
                 .astype(jnp.int32) - 1) // vsnap * vsnap,
                0, planes_sc.shape[2] // Cp - pvs)
            ou = pl.multiple_of(ou, 8)
            ovc = pl.multiple_of(ov * Cp, 128)
            winA = planes_sc[slotA, pl.ds(ou, pus), pl.ds(ovc, pvs * Cp)]
            winB = planes_sc[slotB, pl.ds(ou, pus), pl.ds(ovc, pvs * Cp)]

            dxw = (u - ou.astype(f32)) - utaps            # [pus,SR]
            wu = jnp.maximum(0.0, 1.0 - jnp.abs(dxw)).astype(compute_dtype)
            dyw = (v - ov.astype(f32)) - vtaps
            wv = jnp.maximum(0.0, 1.0 - jnp.abs(dyw))     # [pvs,SR] f32

            def uinterp(win):
                return jax.lax.dot_general(
                    win.astype(compute_dtype), wu,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision)  # [pvs*Cp, SR]

            tmpA = uinterp(winA)
            tmpB = uinterp(winB)

            def vcontract(tmp):
                zc = (tmp.reshape(pvs, Cp, SR) * wv.reshape(pvs, 1, SR)
                      ).reshape(pvs * Cp, SR)
                return _block_tree_sum(zc, pvs, Cp)  # [Cp,SR]

            sampA = vcontract(tmpA)
            sampB = vcontract(tmpB)
            wz0 = jnp.maximum(0.0, 1.0 - jnp.abs(z - jf))
            wz1 = jnp.maximum(0.0, 1.0 - jnp.abs(z - (jf + 1.0)))
            samp = sampA * wz0 + sampB * wz1  # [Cp,SR]

            # exact nearest mask: one-hot v picks one x-bilerp of the 0/1
            # channel; floor(+0.5) == mask at the nearest u tap; nearest
            # plane selected by the z one-hot
            wvn = jnp.floor(wv + 0.5)
            mA = jnp.floor(_row_tree_sum(
                tmpA.reshape(pvs, Cp, SR)[:, mask_ch, :] * wvn, pvs) + 0.5)
            mB = jnp.floor(_row_tree_sum(
                tmpB.reshape(pvs, Cp, SR)[:, mask_ch, :] * wvn, pvs) + 0.5)
            g0 = ((z - jf) >= -0.5) & ((z - jf) < 0.5)
            mval = jnp.where(g0, mA, mB)

            density = samp[0:1, :]
            alpha = 1.0 - jnp.exp(
                -jax.nn.softplus(density + act_shift) * interval)
            alphav = jnp.where(valid & (mval > 0.5), alpha, 0.0)
            if fast_thres > 0:
                alphav = jnp.where(alphav > fast_thres, alphav, 0.0)

            # alpha2weight over the S ordered slots (ops/render.py:39-69)
            t_cum = ail_ref[t, 0:1, :]   # running transmittance  [1,R]
            ail = rgb_ref[t, 3:4, :]     # alphainv_last rides as rgb row 3
            ws = []
            for s in range(S):
                a_s = alphav[:, s * R:(s + 1) * R]
                alive = t_cum >= render.EARLY_TERM_THRES
                w_s = jnp.where(alive, t_cum * a_s, 0.0)
                if fast_thres > 0:
                    w_s = jnp.where(w_s > fast_thres, w_s, 0.0)
                t_cum = t_cum * (1.0 - a_s)
                ail = jnp.where(alive, t_cum, ail)
                ws.append(w_s)
            w_cat = jnp.concatenate(ws, axis=1)  # [1,SR]
            ail_ref[t, 0:1, :] = t_cum
            rgb_ref[t, 3:4, :] = ail

            @pl.when(jnp.max(w_cat) > 0.0)
            def _():
                if n_layers == 0:
                    rgb_raw = jax.nn.sigmoid(samp[1:4, :])
                else:
                    vde_t = vde_ref[t]  # [E,R]
                    vde_l = jnp.concatenate([vde_t] * S, axis=1)  # [E,SR]
                    feat = samp[1:1 + k0_dim, :]
                    h = jnp.concatenate(
                        [feat if rgb_direct else feat[3:, :], vde_l],
                        axis=0).astype(compute_dtype)
                    for li in range(n_layers):
                        w = mlp_refs[2 * li][...]
                        bb = mlp_refs[2 * li + 1][...]
                        h = jax.lax.dot_general(
                            w.astype(compute_dtype), h,
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=precision) + bb.astype(f32)
                        if li < n_layers - 1:
                            h = act(h).astype(compute_dtype)
                    if rgb_direct:
                        rgb_raw = jax.nn.sigmoid(h)
                    else:
                        rgb_raw = jax.nn.sigmoid(h + samp[1:4, :])
                sv = (ks + 0.5) * (1.0 / n_ref)
                wr = w_cat * rgb_raw            # [3,SR]
                wd = w_cat * sv                 # [1,SR]
                racc = rgb_ref[t, 0:3, :]
                dacc = depth_ref[t, 0:1, :]
                for s in range(S):
                    racc = racc + wr[:, s * R:(s + 1) * R]
                    dacc = dacc + wd[:, s * R:(s + 1) * R]
                rgb_ref[t, 0:3, :] = racc
                depth_ref[t, 0:1, :] = dacc

    def plane_step(j):
        slotA = j % _NBUF
        slotB = (j + 1) % _NBUF
        jf = j.astype(f32)

        @pl.when(j > j0g)
        def _():
            wait_dma(slotB)  # plane j+1, started during slab j-1

        @pl.when((j + 2 <= Z - 1) & (j + 1 <= jhg))
        def _():
            start_dma((j + 2) % _NBUF, j + 2)

        def tile_body(t, alive_next):
            t_cum = ail_ref[t, 0:1, :]
            in_range = (j >= jlo_ref[0, t]) & (j <= jhi_ref[0, t])
            if early_exit:
                @pl.when(in_range
                         & (jnp.max(t_cum) >= render.EARLY_TERM_THRES))
                def _():
                    tile_step(t, j, jf, slotA, slotB)
            else:
                @pl.when(in_range)
                def _():
                    tile_step(t, j, jf, slotA, slotB)
            live_n = jnp.where(j + 1 <= jhi_ref[0, t],
                               jnp.max(ail_ref[t, 0:1, :]), 0.0)
            return jnp.maximum(alive_next, live_n)

        return jax.lax.fori_loop(0, TG, tile_body, jnp.float32(0.0))

    @pl.when(j0g <= jhg)
    def _():
        start_dma(j0g % _NBUF, j0g)
        start_dma((j0g + 1) % _NBUF, j0g + 1)
        wait_dma(j0g % _NBUF)
        wait_dma((j0g + 1) % _NBUF)

        if early_exit:
            def cond(state):
                j, alive_any = state
                return (j <= jhg) & (alive_any >= render.EARLY_TERM_THRES)

            def wbody(state):
                j, _ = state
                return j + 1, plane_step(j)

            j_end, _ = jax.lax.while_loop(
                cond, wbody, (j0g, jnp.float32(1.0)))
        else:
            def fbody(j, _):
                return plane_step(j)

            jax.lax.fori_loop(j0g, jhg + 1, fbody, jnp.float32(0.0))
            j_end = jhg + 1

        # drain the in-flight prefetch (issued at slab j_end-1 for plane
        # j_end+1, waited only by the never-run slab j_end)
        @pl.when((j_end <= jhg + 1) & (j_end + 1 <= Z - 1) & (j_end <= jhg)
                 & (j_end > j0g))
        def _():
            wait_dma((j_end + 1) % _NBUF)


# ---------------------------------------------------------------------------
# host-side driver
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=(
    "Z", "Ul", "Vl", "Cp", "S", "pus", "pvs", "vsnap", "mask_ch", "k0_dim",
    "act_shift", "interval", "fast_thres", "n_ref", "K", "rgb_direct",
    "act", "early_exit", "use_bf16", "TG", "interpret"))
def sweep_box_pallas(packed_flat, consts, vde, jlohi, mlp_flat, *,
                     Z: int, Ul: int, Vl: int, Cp: int, S: int, pus: int,
                     pvs: int, vsnap: int, mask_ch: int, k0_dim: int,
                     act_shift: float, interval: float, fast_thres: float,
                     n_ref: int, K: int, rgb_direct: bool, act,
                     early_exit: bool, use_bf16: bool, TG: int,
                     interpret: bool = False):
    """Run the fused kernel over all tiles (grid = tile groups of TG).

    consts: [T, 8, R] (u0,du,v0,dv,z0,dz,kmax,0); vde: [T, E, R];
    jlohi: [2, T] int32.  Returns (rgb [T,3,R], depth [T,R], ail [T,R])."""
    T = consts.shape[0]
    R = consts.shape[-1]
    nTG = -(-T // TG)
    Tp = nTG * TG
    if Tp != T:  # pad with empty tiles (j_lo=Z > j_hi=-1 -> skipped)
        consts = jnp.concatenate(
            [consts, jnp.zeros((Tp - T,) + consts.shape[1:], consts.dtype)])
        vde = jnp.concatenate(
            [vde, jnp.zeros((Tp - T,) + vde.shape[1:], vde.dtype)])
        pad_iv = jnp.tile(jnp.asarray([[Z], [-1]], jnp.int32), (1, Tp - T))
        jlohi = jnp.concatenate([jlohi, pad_iv], axis=1)

    n_layers = len(mlp_flat) // 2
    compute_dtype = jnp.bfloat16 if use_bf16 else jnp.float32
    precision = None if use_bf16 else jax.lax.Precision.HIGHEST
    vde = vde.astype(compute_dtype)
    mlp_t = []
    for li in range(n_layers):
        mlp_t.append(mlp_flat[2 * li])                     # [Cin, W]
        mlp_t.append(mlp_flat[2 * li + 1].reshape(-1, 1))  # [W, 1]

    kernel = functools.partial(
        _box_kernel, Z=Z, Ul=Ul, Vl=Vl, Cp=Cp, TG=TG, S=S, pus=pus, pvs=pvs,
        vsnap=vsnap, mask_ch=mask_ch, k0_dim=k0_dim, n_layers=n_layers,
        act_shift=act_shift, interval=interval, fast_thres=fast_thres,
        n_ref=n_ref, K=K, rgb_direct=rgb_direct, act=act,
        early_exit=early_exit, compute_dtype=compute_dtype,
        precision=precision)

    tile_block = lambda c, dt=None: pl.BlockSpec(
        (TG, c, R), lambda tg: (tg, 0, 0), memory_space=pltpu.VMEM)
    smem_row = pl.BlockSpec((1, TG), lambda tg: (0, tg),
                            memory_space=pltpu.SMEM)
    mlp_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in mlp_t]

    rgb4, depth, ail = pl.pallas_call(
        kernel,
        grid=(nTG,),
        in_specs=[
            tile_block(8),                 # consts
            tile_block(vde.shape[1]),      # viewdir PE
            smem_row,                      # j_lo
            smem_row,                      # j_hi
            *mlp_specs,
            pl.BlockSpec(memory_space=pltpu.HBM),  # packed planes
        ],
        out_specs=(tile_block(4), tile_block(1), tile_block(1)),
        out_shape=(
            jax.ShapeDtypeStruct((Tp, 4, R), jnp.float32),
            jax.ShapeDtypeStruct((Tp, 1, R), jnp.float32),
            jax.ShapeDtypeStruct((Tp, 1, R), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((_NBUF,) + packed_flat.shape[1:], packed_flat.dtype),
            pltpu.SemaphoreType.DMA((_NBUF,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(consts, vde, jlohi[0:1], jlohi[1:2], *mlp_t, packed_flat)
    # rgb row 3 carries alphainv_last (t_post at last ALIVE slot); the ail
    # output carries the final running transmittance (not the same thing
    # after saturation) -- return the row-3 value.
    return (jnp.swapaxes(rgb4[:T, 0:3, :], 1, 2), depth[:T, 0, :],
            rgb4[:T, 3, :])


_prep_pallas_cache: dict = {}


def render_frame_box_pallas(cfg, params, buffers, H: int, W: int, Kc, c2w, *,
                            stepsize: float, near: float, bg: float,
                            inverse_y=False, flip_x=False, flip_y=False,
                            use_bf16: bool = True, tile: int = 16,
                            early_exit: bool = True, interpret: bool = False,
                            timers: dict | None = None):
    """Full-frame bounded-scene render through the fused kernel.  Same
    contract/fallback semantics as box_sweep.render_frame_box; additionally
    requires mask resolution == grid resolution (channel-packed mask)."""
    from fourk_nerf_tpu.models import common

    if cfg.density_type != "DenseGrid" or cfg.k0_type != "DenseGrid":
        raise ValueError("box kernel requires dense grids")
    if cfg.rgbnet_full_implicit:
        raise ValueError("box kernel: rgbnet_full_implicit unsupported")
    if tuple(buffers["mask_cache"].shape) != tuple(cfg.world_size):
        raise ValueError("box kernel requires mask res == grid res")
    stepdist = stepsize * cfg.voxel_size
    has_mlp = cfg.rgbnet_dim > 0

    import time as _time

    def _mark(name, *pulls):
        if timers is not None:
            for pp in pulls:
                float(jnp.asarray(pp).reshape(-1)[0])
            timers.setdefault(name, []).append(_time.time())

    _mark("t0")
    stats = np.asarray(_axis_stats(
        cfg, jnp.asarray(Kc), jnp.asarray(c2w), H=H, W=W,
        stepdist=float(stepdist), near=float(near), inverse_y=inverse_y,
        flip_x=flip_x, flip_y=flip_y))
    min_signed, sgn, n_hit = stats[:3], stats[3:6], stats[6]
    if n_hit == 0:
        return {
            "rgb_marched": np.full((H, W, 3), bg, np.float32),
            "rgb_feature": np.zeros((H, W, 3), np.float32),
            "depth": np.zeros((H, W), np.float32),
            "alphainv_last": np.ones((H, W), np.float32),
        }
    axis = int(np.argmax(min_signed))
    mdz = float(min_signed[axis])
    if mdz <= 1.0 / (_S_MAX - 2):
        raise ValueError(
            f"box kernel: no dominant axis (min grid advance {mdz:.4f}/step)")
    S = int(np.ceil(1.0 / mdz)) + 2
    S = -(-S // 4) * 4  # quantize: one compile covers a band of orbit poses
    flip = bool(sgn[axis] < 0)
    p = _perm(axis)
    Z, U, V = [cfg.world_size[i] for i in p]

    consts, vde, wmin, wmax, hit_any, spread = _prep_box(
        cfg, jnp.asarray(Kc), jnp.asarray(c2w), buffers["mask_cache"],
        H=H, W=W, tile=tile, axis=axis, flip=flip, stepsize=float(stepsize),
        near=float(near), inverse_y=inverse_y, flip_x=flip_x, flip_y=flip_y,
        vpe=cfg.viewbase_pe if has_mlp else 0)
    spread = np.asarray(spread)  # the one prep pull
    # occupancy dilation radius: the window's interpolation support reaches
    # at most spread/2 + 2 cells from the window center.  FIXED at 3 blocks
    # (covers spread <= 42) so orbit poses share one compiled program --
    # spread-derived statics recompiled per pose measured 2.4 s/frame vs
    # 0.29 s with stable statics
    block = 8
    ndil = int(np.ceil((float(max(spread)) / 2 + 3.0) / block))
    ndil = 3 if ndil <= 3 else ndil + 1
    jlohi = _occ_intervals(
        buffers["mask_cache"], wmin, wmax, hit_any, axis=axis, flip=flip,
        Z=Z, block=block, ndil=ndil)
    _mark("prep")

    packed_flat, Cp, mask_ch = pack_box_kernel(
        cfg, params, buffers, axis=axis, flip=flip, use_bf16=use_bf16)
    Up = packed_flat.shape[1]
    Vp = packed_flat.shape[2] // Cp
    vsnap = 128 // math.gcd(128, Cp)
    # window sizes quantized to 16 so orbit poses with drifting footprints
    # share one compiled program (see ndil comment above)
    pus = min(Up, int(np.ceil((spread[0] + 4 + 8) / 16.0) * 16))
    need_v = spread[1] + 4 + vsnap
    qv = int(np.lcm(vsnap, 16))
    pvs = min(Vp, int(np.ceil(need_v / qv) * qv))
    if pus * pvs > 96 * 96:
        raise ValueError(f"box kernel: window {pus}x{pvs} too large")

    T = consts.shape[0]
    R = tile * tile
    E = vde.shape[-1] if has_mlp else 3
    # VMEM plan: accumulators+consts+vde per tile, plane ring, windows
    per_tile = R * (6 * 4 + 8 * 4 + E * (2 if use_bf16 else 4))
    ring = _NBUF * int(np.prod(packed_flat.shape[1:])) * (
        2 if use_bf16 else 4)
    # f32 (parity/metrics) programs get a smaller tile-group budget: the
    # doubled window/tmp footprint at full-frame scale crashed the Mosaic
    # compile at the bf16-sized groups (HTTP 500 from the remote helper)
    budget = (80 if use_bf16 else 40) * 1024 * 1024 - ring
    TG = max(128, budget // max(per_tile, 1) // 128 * 128)  # SMEM blocks
    TG = min(TG, -(-T // 128) * 128)                        # need %128 == 0
    vde_in = jnp.swapaxes(vde, 1, 2) if has_mlp else jnp.zeros(
        (T, 1, R), jnp.float32)

    mlp_flat = []
    if has_mlp:
        mlp = params["rgbnet"]
        for li in range(len(mlp) // 2):
            mlp_flat.append(mlp[f"w{li}"])
            mlp_flat.append(mlp[f"b{li}"].reshape(1, -1))

    rgb, depth, ail = sweep_box_pallas(
        packed_flat, consts, vde_in, jlohi, tuple(mlp_flat),
        Z=Z, Ul=U, Vl=V, Cp=Cp, S=S, pus=pus, pvs=pvs, vsnap=vsnap,
        mask_ch=mask_ch, k0_dim=cfg.k0_dim, act_shift=float(cfg.act_shift),
        interval=float(stepsize * cfg.voxel_size_ratio),
        fast_thres=float(cfg.fast_color_thres),
        n_ref=cfg.n_samples_ref(stepsize), K=cfg.n_samples(stepsize),
        rgb_direct=bool(cfg.rgbnet_direct),
        act=common.activation(cfg.act_type) if cfg.act_type else jax.nn.relu,
        early_exit=early_exit, use_bf16=use_bf16, TG=TG,
        interpret=interpret)
    out = _assemble(rgb, depth, ail, jnp.float32(bg), tile=tile, H=H, W=W)
    _mark("sweep", out["rgb_marched"])
    if timers is not None:
        timers["plan"] = (tile, axis, flip, S, pus, pvs, TG)
    return out


@functools.partial(jax.jit, static_argnames=("tile", "H", "W"))
def _assemble(rgb, depth, ail, bg, *, tile: int, H: int, W: int):
    ph, pw = (-H) % tile, (-W) % tile
    nty, ntx = (H + ph) // tile, (W + pw) // tile

    def untile(x):
        c = x.shape[-1] if x.ndim == 3 else 1
        x = x.reshape(nty, ntx, tile, tile, c).transpose(0, 2, 1, 3, 4)
        return x.reshape(nty * tile, ntx * tile, c)[:H, :W]

    feat = untile(rgb)
    a = untile(ail[..., None])[..., 0]
    return {"rgb_marched": feat + a[..., None] * bg, "rgb_feature": feat,
            "depth": untile(depth[..., None])[..., 0], "alphainv_last": a}

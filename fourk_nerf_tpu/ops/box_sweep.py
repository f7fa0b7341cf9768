"""Gather-free axis-aligned slab-sweep renderer for bounded scenes (DirectVoxGO).

The reference serves bounded scenes with a fused CUDA chain
(/root/reference/lib/cuda/render_utils_kernel.cu:144-242 sample_pts_on_rays +
raw2alpha + alpha2weight) over a thrice-compacted ragged point list; our
chunked-gather fallback reproduces that math exactly but XLA scalarizes the
random voxel gathers (~33 s/frame at lego scale).  This module replaces the
gathers with the machinery that made the NDC plane sweep fast
(ops/plane_sweep.py), generalized to arbitrary (perspective) rays:

- Pick the frame's dominant grid axis: inward-facing captures concentrate ray
  directions in a narrow cone, so all bbox-hitting rays share a major axis
  along which their grid coordinate advances monotonically by at least
  ``dz_min`` grid cells per sample step.  Sweep that axis SLAB by slab
  (between adjacent grid planes), holding the plane pair resident; each plane
  is read from HBM exactly once per phase.
- Within slab j, ray r owns a **closed-form contiguous sample range**
  ``k in [ceil((j - z0_r)/dz_r), ...)`` of at most ``S = ceil(1/dz_min)+2``
  slots (its major coordinate is affine in the sample index k).  All rays of
  a pixel tile advance together: positions for the ``R*S`` slot block are
  evaluated, samples outside the slab are masked (alpha=0 == the reference's
  ragged compaction, see ops/render.py docstring).
- A tile's (u, v) footprint on the slab is a compact window whose origin
  moves smoothly with j (measured per frame).  Each (tile, slab) fetches the
  window from both resident planes with one ``dynamic_slice`` each -- no
  scalar gathers anywhere.  Trilinear interpolation is separable hat-weight
  contractions: ``wu`` on the MXU ([R*S, Pu] @ [Pu, Pv*2C]), ``wv`` as a
  short VPU contraction, then a 2-tap blend across the plane pair.
- The per-slab alpha -> transmittance -> composite runs as a ``lax.scan``
  carrying the accumulated transmittance, reproducing
  ``alpha2weight``'s early-termination and ``alphainv_last`` semantics
  exactly (render_utils_kernel.cu:576-605).

The free-space mask is read with snapped one-hot weights in all three axes
(exact nearest-neighbor ``maskcache_lookup``, render_utils_kernel.cu:367-424),
either as a packed channel (mask resolution == grid resolution) or from a
per-slab stack of native-resolution mask planes.

Numerics: with ``use_bf16=False`` outputs match the chunked path
(``models.dvgo.forward``) to f32 tolerance (tests/test_box_sweep.py); sample
positions, validity, alpha, thresholds and early termination use the same
formulas.  ``use_bf16=True`` is the metric-free speed mode (bf16 MXU passes,
f32 accumulation), same policy as ops/plane_sweep.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from fourk_nerf_tpu.models import common
from fourk_nerf_tpu.ops import render, rays as ray_ops

_EPSK = 5e-3   # k-range ceil guard against f32 rounding (S carries headroom)
_S_MAX = 24    # beyond this many slots/slab the sweep loses to chunked math
_BIG = 3e8


def _round_up8(v: float) -> int:
    return int(np.ceil((float(v)) / 8.0) * 8)


def _perm(axis: int):
    return (axis, (axis + 1) % 3, (axis + 2) % 3)


def _tiles_of(x, nty, ntx, tile):
    c = x.shape[-1]
    return (x.reshape(nty, tile, ntx, tile, c).transpose(0, 2, 1, 3, 4)
            .reshape(nty * ntx, tile * tile, c))


def _nearest(x):
    """Nearest index under the snapped-hat convention rel in [-0.5, 0.5)."""
    return np.floor(x + 0.5).astype(np.int64)


@functools.partial(jax.jit, static_argnames=(
    "cfg", "H", "W", "stepdist", "near", "inverse_y", "flip_x", "flip_y"))
def _axis_stats(cfg, Kc, c2w, *, H: int, W: int, stepdist: float, near: float,
                inverse_y: bool, flip_x: bool, flip_y: bool):
    """Per-axis worst-case signed grid advance per sample step over
    bbox-hitting rays, packed as [min_signed(3), sign(3), n_hit] -- ONE small
    pull decides the sweep axis on the host."""
    ro, rd, _ = ray_ops.get_rays_of_a_view(
        H, W, Kc, c2w, ndc=False, inverse_y=inverse_y, flip_x=flip_x,
        flip_y=flip_y)
    ro = ro.reshape(-1, 3)
    rd = rd.reshape(-1, 3)
    xyz_min = jnp.asarray(cfg.xyz_min)
    xyz_max = jnp.asarray(cfg.xyz_max)
    sizes = jnp.asarray(cfg.world_size, jnp.float32)
    t_min, t_max = render.ray_aabb(ro, rd, xyz_min, xyz_max, near, 1e9)
    hit = t_max > t_min
    unit = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    dz = unit * stepdist / (xyz_max - xyz_min) * (sizes - 1.0)  # [N,3]
    sgn = jnp.sign(jnp.sum(jnp.where(hit[:, None], dz, 0.0), axis=0))
    sgn = jnp.where(sgn == 0, 1.0, sgn)
    signed = dz * sgn
    min_signed = jnp.min(jnp.where(hit[:, None], signed, _BIG), axis=0)
    return jnp.concatenate(
        [min_signed, sgn, jnp.sum(hit).astype(jnp.float32)[None]])


@functools.partial(jax.jit, static_argnames=(
    "cfg", "H", "W", "tile", "axis", "flip", "stepsize", "near",
    "inverse_y", "flip_x", "flip_y", "vpe"))
def _prep_frame(cfg, Kc, c2w, *, H: int, W: int, tile: int, axis: int,
                flip: bool, stepsize: float, near: float, inverse_y: bool,
                flip_x: bool, flip_y: bool, vpe: int):
    """Single-dispatch frame prep: rays -> per-ray sampling params tiled
    [T, R, .] in PERMUTED world coordinates (major axis first), the flipped
    major-axis affine (z0, dz), per-(slab, tile) footprint window minima
    [Z-1, T, 2], and the global footprint spread [2] (the only host pull)."""
    p = _perm(axis)
    X, Y, Zf = [cfg.world_size[i] for i in p]
    Z = X  # major-axis extent
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
    return _prep_core(cfg, ro_t, rd_t, vd_t, axis=axis, flip=flip,
                      stepsize=stepsize, near=near, vpe=vpe)


def _prep_core(cfg, ro_t, rd_t, vd_t, *, axis: int, flip: bool,
               stepsize: float, near: float, vpe: int):
    """Per-ray sampling params for already-tiled rays [T,R,3] (shared by
    the frame prep and the training ray-batch prep)."""
    p = _perm(axis)
    X, Y, Zf = [cfg.world_size[i] for i in p]
    Z = X
    stepdist = stepsize * cfg.voxel_size
    K = cfg.n_samples(stepsize)
    mn_all = jnp.asarray(cfg.xyz_min)
    mx_all = jnp.asarray(cfg.xyz_max)

    # identical formulas to render.sample_pts_on_rays_fixed (parity)
    t_min, t_max = render.ray_aabb(ro_t, rd_t, mn_all, mx_all, near, 1e9)
    hit_fp = t_max > t_min  # strict: tangent rays excluded from footprints
    rnorm = jnp.linalg.norm(rd_t, axis=-1)
    n_per = jnp.maximum(jnp.ceil((t_max - t_min) * rnorm / stepdist), 1.0)
    start = ro_t + rd_t * t_min[..., None]
    unit = rd_t / rnorm[..., None]
    vdir_emb = ray_ops.positional_encoding(vd_t, vpe) if vpe else vd_t

    pl = list(p)
    start_p = start[..., pl]
    unit_p = unit[..., pl]
    mn = mn_all[jnp.asarray(pl)]
    mx = mx_all[jnp.asarray(pl)]
    sz = jnp.asarray([Z, Y, Zf], jnp.float32)
    # grid coords affine in k: pos(k) = aff0 + dk * k  (chunked-path formula:
    # ind01 * (n-1), see grid_sample.world_to_ind01)
    aff0 = (start_p - mn) / (mx - mn) * (sz - 1.0)
    dk = unit_p * stepdist / (mx - mn) * (sz - 1.0)
    z0, dz = aff0[..., 0], dk[..., 0]
    if flip:
        z0 = (Z - 1) - z0
        dz = -dz
    dz = jnp.where(jnp.abs(dz) < 1e-8, 1e-8, dz)  # miss rays: keep finite
    u0, du = aff0[..., 1], dk[..., 1]
    v0, dv = aff0[..., 2], dk[..., 2]
    kmax = jnp.minimum(n_per - 1.0, float(K - 1))

    def body(_, j):
        ka_r = (j - z0) / dz
        kb_r = (j + 1.0 - z0) / dz
        ka = jnp.clip(jnp.ceil(ka_r - _EPSK), 0.0, kmax)
        kb = jnp.clip(kb_r, 0.0, kmax)
        # rays whose sample range doesn't intersect this slab contribute no
        # member samples; their clamped entry/exit evaluation points can sit
        # FAR from the tile's active rays (e.g. a tile straddling a bbox
        # edge, where part of the rays enter through a minor-axis face many
        # slabs later) -- excluding them keeps the window tight
        active = hit_fp & (jnp.minimum(kb_r, kmax + 1.0)
                           >= jnp.maximum(ka_r, 0.0) - 0.5)
        ulo = jnp.minimum(u0 + du * ka, u0 + du * kb)
        uhi = jnp.maximum(u0 + du * ka, u0 + du * kb)
        vlo = jnp.minimum(v0 + dv * ka, v0 + dv * kb)
        vhi = jnp.maximum(v0 + dv * ka, v0 + dv * kb)
        big = jnp.float32(_BIG)
        wmin = jnp.stack([
            jnp.min(jnp.where(active, ulo, big), axis=1),
            jnp.min(jnp.where(active, vlo, big), axis=1)], axis=-1)  # [T,2]
        wmax = jnp.stack([
            jnp.max(jnp.where(active, uhi, -big), axis=1),
            jnp.max(jnp.where(active, vhi, -big), axis=1)], axis=-1)
        return None, (wmin, wmax)

    js = jnp.arange(Z - 1, dtype=jnp.float32)
    _, (wmin, wmax) = jax.lax.scan(body, None, js)  # [Z-1,T,2]
    spread = jnp.max(jnp.clip(wmax - wmin, 0.0, None), axis=(0, 1))  # [2]
    return (start_p, unit_p, n_per, vdir_emb, z0, dz, kmax, wmin, spread)


def _pack_volumes(cfg, params, buffers, axis: int, flip: bool):
    """density(+k0)(+mask channel) -> axis-major [Z, U, V, Cp] (channels
    padded to a lane-friendly multiple of 8), plus native-mask info."""
    p = _perm(axis)
    density = params["density"]
    k0 = params["k0"]
    mask = buffers["mask_cache"]
    channel_mode = tuple(mask.shape) == tuple(cfg.world_size)
    parts = [density, k0]
    if channel_mode:
        parts.append(mask.astype(density.dtype)[..., None])
    vol = jnp.concatenate(parts, axis=-1)
    cp = vol.shape[-1]
    pad = (-cp) % 8
    if pad:
        vol = jnp.pad(vol, ((0, 0),) * 3 + ((0, pad),))
    vol = jnp.transpose(vol, p + (3,))
    if flip:
        vol = vol[::-1]
    if channel_mode:
        return vol, ("channel", cp - 1), None
    mvol = jnp.transpose(mask, p).astype(jnp.float32)
    if flip:
        mvol = mvol[::-1]
    return vol, ("native", None), mvol


def _mask_plane_plan(Z: int, mZ: int):
    """Host-side: which native-mask planes each slab needs.  Slab j's samples
    have flipped major coordinate z in ~[j, j+1]; their nearest mask plane
    index lies in [nearest(j*msz)-1, nearest((j+1)*msz)+1] (the +-1 absorbs
    the f32 gap between the affine and position-chain z).  Returns
    (base [Z-1] int32 nominal first index, Wm static count)."""
    msz = (mZ - 1) / max(Z - 1, 1)
    j = np.arange(Z - 1, dtype=np.float64)
    base = _nearest(j * msz) - 1
    top = _nearest((j + 1) * msz) + 1
    Wm = int(np.max(top - base)) + 1
    return base.astype(np.int32), Wm


def _hat(rel, P: int):
    """[...] relative positions -> [..., P] two-tap hat weights."""
    taps = jnp.arange(P, dtype=rel.dtype)
    return jnp.maximum(0.0, 1.0 - jnp.abs(rel[..., None] - taps))


def _onehot(rel, P: int):
    """Snapped one-hot weights (exact nearest-neighbor, rel in [-0.5, 0.5);
    matches grid_sample.nearest_mask_lookup)."""
    taps = jnp.arange(P, dtype=rel.dtype)
    d = rel[..., None] - taps
    return ((d >= -0.5) & (d < 0.5)).astype(rel.dtype)


@functools.partial(jax.jit, static_argnames=(
    "cfg", "stepsize", "S", "Pu", "Pv", "axis", "flip", "use_bf16",
    "mask_mode", "mask_ch", "mPu", "mPv", "Wm", "bg", "ablate", "train"))
def _sweep(cfg, params, buffers, start_p, unit_p, n_per, vdir_emb, z0, dz,
           kmax, wmin_all, *, stepsize: float, S: int, Pu: int, Pv: int,
           axis: int, flip: bool, use_bf16: bool, mask_mode: str,
    mask_ch: int | None, mPu: int, mPv: int, Wm: int, bg: float,
    ablate: str = "", train: bool = False):
    """Slab-outer sweep: each grid plane is read from HBM exactly once; all
    ray tiles advance together.  Returns (rgb_marched [T,R,3], depth [T,R],
    alphainv_last [T,R]); with ``train=True`` additionally the per-sample
    tensors the encoder losses need, stacked slab-major:
    (weights [Z-1,T,R,S], raw_rgb [Z-1,T,R,S,3], ks [Z-1,T,R,S]) — each
    global sample index k belongs to exactly one (slab, slot), every other
    slot carries weight 0, so the flattened [T,R,(Z-1)*S] layout is the
    dense masked formulation of ops/render.py with a different shape."""
    p = _perm(axis)
    Z, U, V = [cfg.world_size[i] for i in p]
    K = cfg.n_samples(stepsize)
    n_ref = cfg.n_samples_ref(stepsize)
    stepdist = stepsize * cfg.voxel_size
    interval = stepsize * cfg.voxel_size_ratio
    fct = float(cfg.fast_color_thres)
    kdim = cfg.k0_dim
    has_mlp = cfg.rgbnet_dim > 0
    mm = jnp.bfloat16 if use_bf16 else jnp.float32
    pl = list(p)
    mn = jnp.asarray(cfg.xyz_min)[jnp.asarray(pl)]
    mx = jnp.asarray(cfg.xyz_max)[jnp.asarray(pl)]
    sz = jnp.asarray([Z, U, V], jnp.float32)
    act = common.activation(cfg.act_type) if cfg.act_type else jax.nn.relu
    mlp_mm = (jax.tree.map(lambda x: x.astype(mm), params["rgbnet"])
              if has_mlp else None)
    T, R, _ = start_p.shape

    vol, (mode, mc), mvol = _pack_volumes(cfg, params, buffers, axis, flip)
    assert mode == mask_mode and mc == mask_ch
    Cp = vol.shape[-1]
    if mask_mode == "native":
        mZ, mU, mV = mvol.shape
        base_np, _wm = _mask_plane_plan(Z, mZ)
        idx = np.clip(base_np[:, None] + np.arange(Wm)[None, :], 0, mZ - 1)
        mplanes = mvol[jnp.asarray(idx)]          # [Z-1, Wm, mU, mV]
        base = jnp.asarray(base_np, jnp.float32)  # [Z-1]
        msu = (mU - 1) / max(U - 1, 1)
        msv = (mV - 1) / max(V - 1, 1)
        msz = (mZ - 1) / max(Z - 1, 1)
    else:
        mplanes = jnp.zeros((Z - 1, 1, 1, 1), jnp.float32)
        base = jnp.zeros((Z - 1,), jnp.float32)

    def body(carry, inp):
        plane_prev, t_cum, ail, rgb_acc, depth_acc = carry
        plane_cur, wmin, j, mpl, base_j = inp

        k_lo = jnp.clip(jnp.ceil((j - z0) / dz - _EPSK), 0.0, kmax)  # [T,R]
        ks = k_lo[..., None] + jnp.arange(S, dtype=jnp.float32)      # [T,R,S]
        pts = (start_p[:, :, None, :]
               + unit_p[:, :, None, :] * (stepdist * ks)[..., None])
        in_bbox = jnp.all((pts >= mn) & (pts <= mx), axis=-1)
        pos = (pts - mn) / (mx - mn) * (sz - 1.0)
        zp = ((Z - 1) - pos[..., 0]) if flip else pos[..., 0]
        z_aff = z0[..., None] + dz[..., None] * ks
        member = jnp.clip(jnp.floor(z_aff), 0.0, float(Z - 2)) == j
        valid = member & in_bbox & (ks < n_per[..., None]) & (ks < K)

        ou = jnp.clip(jnp.floor(wmin[:, 0]).astype(jnp.int32) - 1, 0, U - Pu)
        ov = jnp.clip(jnp.floor(wmin[:, 1]).astype(jnp.int32) - 1, 0, V - Pv)
        slice_win = lambda pln: jax.vmap(
            lambda x0, y0: jax.lax.dynamic_slice(pln, (x0, y0, 0),
                                                 (Pu, Pv, Cp)))(ou, ov)
        patch2 = jnp.concatenate(
            [slice_win(plane_prev), slice_win(plane_cur)], axis=-1)

        uf = pos[..., 1].reshape(T, R * S)
        vf = pos[..., 2].reshape(T, R * S)
        zf = zp.reshape(T, R * S)
        rel_u = uf - ou[:, None].astype(uf.dtype)
        rel_v = vf - ov[:, None].astype(vf.dtype)
        wu = _hat(rel_u, Pu)  # [T,RS,Pu]
        wv = _hat(rel_v, Pv)
        if ablate == "nointerp":  # keep the DMA, drop the contractions
            samp2 = jnp.broadcast_to(patch2[:, 0, 0, None, :],
                                     (T, R * S, 2 * Cp)) * wu[..., :1]
        elif ablate == "fused":   # outer-product single-matmul variant
            wuv = (wu[..., :, None] * wv[..., None, :]).reshape(
                T, R * S, Pu * Pv)
            samp2 = jax.lax.dot_general(
                wuv.astype(mm), patch2.reshape(T, Pu * Pv, 2 * Cp).astype(mm),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
        else:
            tmp = jnp.einsum(
                "trp,tpqc->trqc", wu.astype(mm), patch2.astype(mm),
                preferred_element_type=jnp.float32)      # [T,RS,Pv,2Cp]
            samp2 = jnp.einsum("trq,trqc->trc", wv, tmp)  # [T,RS,2Cp]
        wz0 = jnp.maximum(0.0, 1.0 - jnp.abs(zf - j))
        wz1 = jnp.maximum(0.0, 1.0 - jnp.abs(zf - (j + 1.0)))
        samp = (wz0[..., None] * samp2[..., :Cp]
                + wz1[..., None] * samp2[..., Cp:])      # [T,RS,Cp]
        samp = samp.reshape(T, R, S, Cp)
        density = samp[..., 0]
        feat = samp[..., 1:1 + kdim]

        # exact nearest-neighbor mask: snapped one-hot in ALL axes
        if ablate == "nomask":
            mval = jnp.ones((T, R * S), jnp.float32)
        elif mask_mode == "channel":
            pm = jnp.stack([patch2[..., mask_ch], patch2[..., Cp + mask_ch]],
                           axis=-1)                      # [T,Pu,Pv,2]
            mtmp = jnp.einsum("trp,tpqc->trqc", _onehot(rel_u, Pu), pm)
            mpair = jnp.einsum("trq,trqc->trc", _onehot(rel_v, Pv), mtmp)
            g0 = (zf - j >= -0.5) & (zf - j < 0.5)
            mval = jnp.where(g0, mpair[..., 0], mpair[..., 1])
        else:
            oum = jnp.clip((jnp.floor(wmin[:, 0] * msu)).astype(jnp.int32) - 1,
                           0, mU - mPu)
            ovm = jnp.clip((jnp.floor(wmin[:, 1] * msv)).astype(jnp.int32) - 1,
                           0, mV - mPv)
            mpatch = jax.vmap(
                lambda x0, y0: jax.lax.dynamic_slice(
                    mpl, (0, x0, y0), (Wm, mPu, mPv)))(oum, ovm)
            rel_um = uf * msu - oum[:, None].astype(uf.dtype)
            rel_vm = vf * msv - ovm[:, None].astype(vf.dtype)
            rel_zm = zf * msz - base_j
            mtmp = jnp.einsum("trp,twpq->trwq", _onehot(rel_um, mPu),
                              mpatch)
            m2 = jnp.einsum("trq,trwq->trw", _onehot(rel_vm, mPv), mtmp)
            mval = jnp.sum(_onehot(rel_zm, Wm) * m2, axis=-1)
        mval = mval.reshape(T, R, S)

        valid = valid & (mval > 0.5)
        alpha = render.raw2alpha(density, cfg.act_shift, interval)
        if fct > 0:
            valid = valid & (alpha > fct)
        alphav = jnp.where(valid, alpha, 0.0)

        # alpha2weight semantics on the slot block (ops/render.py:39-69):
        # the cumprod is NOT alive-gated; alive = pre-transmittance >= thres;
        # alphainv_last tracks t_post at the last alive slot
        om1 = 1.0 - alphav
        cp_ = jnp.cumprod(om1, axis=-1)
        t_pre = t_cum[..., None] * jnp.concatenate(
            [jnp.ones_like(cp_[..., :1]), cp_[..., :-1]], axis=-1)
        t_post = t_cum[..., None] * cp_
        alive = t_pre >= render.EARLY_TERM_THRES
        wgt = jnp.where(alive, t_pre * alphav, 0.0)
        if fct > 0:
            wgt = jnp.where(wgt > fct, wgt, 0.0)
        n_alive = jnp.sum(alive, axis=-1)
        last = jnp.maximum(n_alive - 1, 0)
        ail_blk = jnp.take_along_axis(t_post, last[..., None], axis=-1)[..., 0]
        ail = jnp.where(n_alive > 0, ail_blk, ail)

        # rgb: reference lib/dvgo.py:346-379
        if ablate == "nomlp":
            rgb_raw = jax.nn.sigmoid(samp[..., 1:4])
        elif not has_mlp:
            rgb_raw = jax.nn.sigmoid(feat)
        else:
            vemb = jnp.broadcast_to(vdir_emb[:, :, None, :],
                                    (T, R, S, vdir_emb.shape[-1]))
            if cfg.rgbnet_direct:
                rgb_feat = jnp.concatenate([feat, vemb], axis=-1)
            else:
                rgb_feat = jnp.concatenate([feat[..., 3:], vemb], axis=-1)
            logit = common.mlp_apply(mlp_mm, rgb_feat.astype(mm), act)
            logit = logit.astype(jnp.float32)
            if cfg.rgbnet_direct:
                rgb_raw = jax.nn.sigmoid(logit)
            else:
                rgb_raw = jax.nn.sigmoid(logit + feat[..., :3])

        rgb_acc = rgb_acc + jnp.sum(wgt[..., None] * rgb_raw, axis=2)
        depth_acc = depth_acc + jnp.sum(wgt * ((ks + 0.5) / n_ref), axis=2)
        t_cum = t_post[..., -1]
        ys = (wgt, rgb_raw, ks) if train else None
        return (plane_cur, t_cum, ail, rgb_acc, depth_acc), ys

    init = (vol[0], jnp.ones((T, R), jnp.float32), jnp.ones((T, R), jnp.float32),
            jnp.zeros((T, R, 3), jnp.float32), jnp.zeros((T, R), jnp.float32))
    js = jnp.arange(Z - 1, dtype=jnp.float32)
    (_, t_cum, ail, rgb_acc, depth_acc), ys = jax.lax.scan(
        body, init, (vol[1:], wmin_all, js, mplanes, base))
    out = (rgb_acc + ail[..., None] * bg, depth_acc, ail)
    return out + (ys,) if train else out


def render_frame_box(cfg, params, buffers, H: int, W: int, Kc, c2w, *,
                     stepsize: float, near: float, bg: float,
                     inverse_y=False, flip_x=False, flip_y=False,
                     use_bf16: bool = True, tile: int = 16,
                     timers: dict | None = None, _ablate: str = "",
                     tile_mesh=None, tile_axis: str = "data"):
    """Full-frame bounded-scene render.  Returns dict with
    rgb_marched/rgb_feature/depth/alphainv_last maps ([H,W,*]).

    ``tile_mesh``: optional ``jax.sharding.Mesh`` — the per-tile tensors
    are sharded along ``tile_axis`` so the slab sweep runs data-parallel
    over pixel tiles (grids replicated; each device sweeps its tile
    subset over all slabs).  Applied only when the tile count divides the
    axis size; otherwise single-device behavior is preserved.

    Raises ValueError when the frame's rays don't share a dominant grid axis
    with enough per-step advance (S would exceed ``_S_MAX``) or the grid
    types aren't dense (caller falls back to the chunked-gather path)."""
    if cfg.density_type != "DenseGrid" or cfg.k0_type != "DenseGrid":
        raise ValueError("box sweep requires dense grids")
    if cfg.rgbnet_full_implicit:
        raise ValueError("box sweep: rgbnet_full_implicit unsupported")
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
    if n_hit == 0:  # no ray hits the bbox: pure-background frame
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
            f"box sweep: no dominant axis (min grid advance {mdz:.4f}/step)")
    S = int(np.ceil(1.0 / mdz)) + 2
    S = -(-S // 4) * 4  # quantize: one compile covers a band of orbit poses
    flip = bool(sgn[axis] < 0)
    p = _perm(axis)
    Z, U, V = [cfg.world_size[i] for i in p]

    while True:
        prep = _prep_frame(
            cfg, jnp.asarray(Kc), jnp.asarray(c2w), H=H, W=W, tile=tile,
            axis=axis, flip=flip, stepsize=float(stepsize), near=float(near),
            inverse_y=inverse_y, flip_x=flip_x, flip_y=flip_y,
            vpe=cfg.viewbase_pe if has_mlp else 0)
        start_p, unit_p, n_per, vdir_emb, z0, dz, kmax, wmin, spread = prep
        spread = np.asarray(spread)  # the one prep pull
        Pu = min(U, max(16, _round_up8(spread[0] + 4)))
        Pv = min(V, max(16, _round_up8(spread[1] + 4)))
        if (Pu <= 48 and Pv <= 48) or tile <= 4:
            break
        tile //= 2
    _mark("prep")

    mask = buffers["mask_cache"]
    channel_mode = tuple(mask.shape) == tuple(cfg.world_size)
    if channel_mode:
        mask_mode, mask_ch = "channel", 1 + cfg.k0_dim
        mPu = mPv = Wm = 1
    else:
        mask_mode, mask_ch = "native", None
        mZ, mU, mV = [mask.shape[i] for i in p]
        _, Wm = _mask_plane_plan(Z, mZ)
        mPu = min(mU, _round_up8(spread[0] * (mU - 1) / max(U - 1, 1) + 5))
        mPv = min(mV, _round_up8(spread[1] * (mV - 1) / max(V - 1, 1) + 5))

    if tile_mesh is not None and start_p.shape[0] % tile_mesh.shape[tile_axis] == 0:
        from jax.sharding import NamedSharding, PartitionSpec as _P

        s_tile = NamedSharding(tile_mesh, _P(tile_axis))
        put = lambda x: jax.device_put(x, s_tile)
        start_p, unit_p, n_per, vdir_emb, z0, dz, kmax = map(
            put, (start_p, unit_p, n_per, vdir_emb, z0, dz, kmax))
        wmin = jax.device_put(wmin, NamedSharding(tile_mesh, _P(None, tile_axis)))

    # metrics-grade f32 must force true-f32 MXU passes (TPU default matmul
    # precision is bf16-grade on f32 inputs; same policy as plane_sweep)
    prec = "default" if use_bf16 else "highest"
    with jax.default_matmul_precision(prec):
        rgb, depth, ail = _sweep(
            cfg, params, buffers, start_p, unit_p, n_per, vdir_emb, z0, dz,
            kmax, wmin, stepsize=float(stepsize), S=S, Pu=Pu, Pv=Pv,
            axis=axis, flip=flip, use_bf16=use_bf16, mask_mode=mask_mode,
            mask_ch=mask_ch, mPu=mPu, mPv=mPv, Wm=Wm, bg=float(bg),
            ablate=_ablate)
    _mark("sweep", rgb)
    if timers is not None:
        timers["plan"] = (tile, axis, flip, S, Pu, Pv, mask_mode)

    ph, pw = (-H) % tile, (-W) % tile
    nty, ntx = (H + ph) // tile, (W + pw) // tile

    def untile(x):
        c = x.shape[-1] if x.ndim == 3 else 1
        x = x.reshape(nty, ntx, tile, tile, c).transpose(0, 2, 1, 3, 4)
        return x.reshape(nty * tile, ntx * tile, c)[:H, :W]

    rgbm = untile(rgb)
    ailm = untile(ail)[..., 0]
    return {
        "rgb_marched": rgbm,
        "rgb_feature": rgbm - ailm[..., None] * bg,
        "depth": untile(depth)[..., 0],
        "alphainv_last": ailm,
    }


# ---------------------------------------------------------------------------
# Differentiable training render for coherent ray batches (pixel patches)
# ---------------------------------------------------------------------------

def _axis_stats_rays(cfg, ro, rd, *, stepdist: float, near: float):
    """:func:`_axis_stats` for an explicit ray batch [N,3]."""
    xyz_min = jnp.asarray(cfg.xyz_min)
    xyz_max = jnp.asarray(cfg.xyz_max)
    sizes = jnp.asarray(cfg.world_size, jnp.float32)
    t_min, t_max = render.ray_aabb(ro, rd, xyz_min, xyz_max, near, 1e9)
    hit = t_max > t_min
    unit = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    dz = unit * stepdist / (xyz_max - xyz_min) * (sizes - 1.0)
    sgn = jnp.sign(jnp.sum(jnp.where(hit[:, None], dz, 0.0), axis=0))
    sgn = jnp.where(sgn == 0, 1.0, sgn)
    signed = dz * sgn
    min_signed = jnp.min(jnp.where(hit[:, None], signed, _BIG), axis=0)
    return jnp.concatenate(
        [min_signed, sgn, jnp.sum(hit).astype(jnp.float32)[None]])


def box_train_plan(cfg, ro, rd, *, stepsize: float, near: float):
    """Host-side STATIC sweep plan (axis, flip, S) for a training ray
    batch; None when the rays share no dominant grid axis (caller falls
    back to the gather path).  Shared S quantization with
    :func:`render_frame_box` so one compile covers a band of poses."""
    stepdist = stepsize * cfg.voxel_size
    stats = np.asarray(_axis_stats_rays(
        cfg, jnp.asarray(np.asarray(ro).reshape(-1, 3)),
        jnp.asarray(np.asarray(rd).reshape(-1, 3)),
        stepdist=float(stepdist), near=float(near)))
    min_signed, sgn, n_hit = stats[:3], stats[3:6], stats[6]
    if n_hit == 0:
        return None
    axis = int(np.argmax(min_signed))
    mdz = float(min_signed[axis])
    if mdz <= 1.0 / (_S_MAX - 2):
        return None
    S = int(np.ceil(1.0 / mdz)) + 2
    S = -(-S // 4) * 4
    return axis, bool(sgn[axis] < 0), S


def box_window_size_for(cfg, ro, rd, vd, *, stepsize: float, near: float,
                        axis: int, flip: bool, cap: int = 64):
    """Host-side STATIC (Pu, Pv) slab-window size for a ray batch (max
    per-slab footprint + hat margins, rounded to 8); None when it exceeds
    ``cap`` (window too wide for an efficient sweep).  Accepts one batch
    [R,3] or pre-tiled patches [T,R,3] (the spread is then the max over
    tiles — training setup passes every sampler patch of a view at
    once)."""
    tile3 = lambda x: (jnp.asarray(np.asarray(x))
                       if np.asarray(x).ndim == 3
                       else jnp.asarray(np.asarray(x).reshape(1, -1, 3)))
    prep = _prep_core(
        cfg, tile3(ro), tile3(rd), tile3(vd),
        axis=axis, flip=flip, stepsize=float(stepsize), near=float(near),
        vpe=0)
    spread = np.asarray(prep[-1])
    p = _perm(axis)
    U, V = cfg.world_size[p[1]], cfg.world_size[p[2]]
    Pu = min(U, max(16, _round_up8(spread[0] + 4)))
    Pv = min(V, max(16, _round_up8(spread[1] + 4)))
    if Pu > cap or Pv > cap:
        return None
    return Pu, Pv


def sweep_rays_train_box(cfg, params, buffers, rays_o, rays_d, viewdirs, *,
                         stepsize: float, near: float, bg: float,
                         axis: int, flip: bool, S: int, Pu: int, Pv: int,
                         key=None, rand_bkgd: bool = False,
                         is_train: bool = True, use_bf16: bool = True):
    """Differentiable slab-sweep render of ONE coherent ray batch (a pixel
    patch), for bounded-scene training: the TPU-native replacement for the
    chunked-gather training forward (models/dvgo.py::forward reproduces
    /root/reference/lib/dvgo.py:327-448; XLA scalarizes its random voxel
    gathers).  Returns the same dense dict as ``dvgo.forward`` with
    K' = (Z-1)*S sample slots: each global sample index k occupies exactly
    one (slab, slot) (weight 0 elsewhere), slab-major ordering is monotone
    in k per ray, so every encoder loss term is computed unchanged.

    ``axis``/``flip``/``S`` come from :func:`box_train_plan`, ``Pu``/``Pv``
    from :func:`box_window_size_for` (static per training phase).
    Gradients flow to density/k0/rgbnet through dynamic_slice + hat-weight
    matmuls + the slab scan (all natively differentiable)."""
    if cfg.density_type != "DenseGrid" or cfg.k0_type != "DenseGrid":
        raise ValueError("box sweep requires dense grids")
    if cfg.rgbnet_full_implicit:
        raise ValueError("box sweep: rgbnet_full_implicit unsupported")
    has_mlp = cfg.rgbnet_dim > 0
    vpe = cfg.viewbase_pe if has_mlp else 0
    prep = _prep_core(cfg, rays_o[None], rays_d[None], viewdirs[None],
                      axis=axis, flip=flip, stepsize=float(stepsize),
                      near=float(near), vpe=vpe)
    start_p, unit_p, n_per, vdir_emb, z0, dz, kmax, wmin, _spread = prep

    mask = buffers["mask_cache"]
    p = _perm(axis)
    Z, U, V = [cfg.world_size[i] for i in p]
    channel_mode = tuple(mask.shape) == tuple(cfg.world_size)
    if channel_mode:
        mask_mode, mask_ch = "channel", 1 + cfg.k0_dim
        mPu = mPv = Wm = 1
    else:
        mask_mode, mask_ch = "native", None
        mZ, mU, mV = [mask.shape[i] for i in p]
        _, Wm = _mask_plane_plan(Z, mZ)
        mPu = min(mU, _round_up8(Pu * (mU - 1) / max(U - 1, 1) + 5))
        mPv = min(mV, _round_up8(Pv * (mV - 1) / max(V - 1, 1) + 5))

    prec = "default" if use_bf16 else "highest"
    with jax.default_matmul_precision(prec):
        rgb, depth, ail, (w_s, rgb_s, ks_s) = _sweep(
            cfg, params, buffers, start_p, unit_p, n_per, vdir_emb, z0, dz,
            kmax, wmin, stepsize=float(stepsize), S=S, Pu=Pu, Pv=Pv,
            axis=axis, flip=flip, use_bf16=use_bf16, mask_mode=mask_mode,
            mask_ch=mask_ch, mPu=mPu, mPv=mPv, Wm=Wm, bg=float(bg),
            train=True)

    R = rays_o.shape[0]
    Kd = (Z - 1) * S
    n_ref = cfg.n_samples_ref(stepsize)
    weights = jnp.transpose(w_s[:, 0], (1, 0, 2)).reshape(R, Kd)
    raw_rgb = jnp.transpose(rgb_s[:, 0], (1, 0, 2, 3)).reshape(R, Kd, 3)
    s = (jnp.transpose(ks_s[:, 0], (1, 0, 2)).reshape(R, Kd) + 0.5) / n_ref
    ail = ail[0]
    rgb_feature = rgb[0] - ail[:, None] * bg
    if rand_bkgd and is_train:
        assert key is not None
        noise = jax.random.uniform(key, (R, 3), dtype=rgb_feature.dtype)
        rgb_marched = rgb_feature + ail[:, None] * noise
    else:
        rgb_marched = rgb_feature + ail[:, None] * bg
    return {
        "alphainv_last": ail,
        "weights": weights,
        "rgb_marched": rgb_marched,
        "rgb_feature": rgb_feature,
        "raw_rgb": raw_rgb,
        "n_max": n_ref,
        "s": jax.lax.stop_gradient(s),
        "depth": jax.lax.stop_gradient(depth[0]),
    }

"""Fused SFTNet body: one Pallas kernel per ResidualDenseBlock_SFT.

The VC-Decoder's RRDB_SFT body (reference /root/reference/lib/sr_esrnet.py:
126-182,446-465) is 15 dense-block applications per frame; under XLA every
dense conv round-trips activations through HBM (measured ~154 GB/s
effective on this chip -- the body is bandwidth-bound at ~400 ms of a
~550 ms fern frame) and the 32-channel growth width underfills the
128-lane MXU. Here one whole dense block runs per pallas_call: a halo'd
spatial tile is DMA'd into VMEM once (double-buffered across the tile
grid), all five dense convs + both SFT layers + the residual run out of
VMEM, and only the tile core is written back.

Conv formulation (v2, shaped by measurement): activations live in
FLATTENED pixel space. Each source tensor is stored THREE TIMES,
dx-shifted by {-1,0,+1} and concatenated on lanes ([P, 3c]); a 3x3 conv
is then three matmuls at row offsets (dy-1)*ww -- offsets sublane-ALIGNED
because ww is a multiple of 16 -- with the dx taps folded into the weight
K-dim ([3c, N]). The first version instead sliced one source buffer at 45
unaligned offsets; Mosaic materializes every such read (~106 MB of VMEM
relayout per tile), which measured no faster than the XLA convs. The v2
scheme writes 10.6 MB/tile (three shifted stores), reads aligned, and the
grouped-source walk emits wide outputs (every later target at once),
cutting MXU passes from 63 to 27 per 8 pixels.

Window DMA uses CLAMPED window starts (no pre-padded frame copy): edge
tiles track the core offset inside their window. Exact per-layer SAME
zero-padding at the true frame boundary is restored by masking
activations outside [0,H)x[0,W) after every nonlinearity, so the fused
body is exact for any frame size. Row-wrap contamination (pixel (i,0)
reading (i-1, ww-1)) only touches the window edge ring, which the halo
absorbs.

Eval path only (the joint trainer's patch-sized body stays on the
differentiable XLA path); numerics match the XLA bf16 body to bf16
rounding, f32 accumulation in both. ops/s2d.py is the pure-XLA fast path
built from the same measurements.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HALO = 8   # >= 5 (five 3x3 convs deep per dense block); 8 keeps DMA
            # windows aligned to the HBM (8,128) tiling
_F = 64     # num_feat
_G = 32     # num_grow_ch / SFT hidden width
_COUT = (_G, _G, _G, _G, _F)
_NW = tuple(sum(_COUT) - _G * s for s in range(5))  # wide N per source


def _lrelu(x):
    return jnp.where(x >= 0, x, 0.2 * x)


def _off(ww: int) -> int:
    return ((ww + 1 + 15) // 16) * 16   # first 16-aligned row >= ww+1


def _rdb_kernel(xw_ref, xin_ref, k0_ref, k1_ref, k2_ref, k3_ref,
                k4_ref, bias_ref, sftm_ref, sftb_ref, out_ref,
                xwin_sc, b0_sc, b1_sc, sem,
                *, th: int, tw: int, H: int, W: int, ny: int, nx: int,
                Hq: int, Wq: int, tail: bool, ablate: str = ""):
    """One program per (ty, tx) tile. See module docstring."""
    m = _HALO
    wh, ww = th + 2 * m, tw + 2 * m
    P = wh * ww
    OFF = _off(ww)
    f32 = jnp.float32
    bf16 = jnp.bfloat16

    ty = pl.program_id(0)
    tx = pl.program_id(1)
    t = ty * nx + tx
    nT = ny * nx

    def win_origin(tt):
        # starts stay 8-aligned: th/tw and the clamp bounds are multiples of 8
        r0 = pl.multiple_of(jnp.clip((tt // nx) * th - m, 0, Hq - wh), 8)
        c0 = pl.multiple_of(jnp.clip((tt % nx) * tw - m, 0, Wq - ww), 8)
        return r0, c0

    def start_dma(slot, tt):
        r0, c0 = win_origin(tt)
        pltpu.make_async_copy(
            xw_ref.at[pl.ds(r0, wh), pl.ds(c0, ww), :],
            xwin_sc.at[slot], sem.at[slot, 0]).start()

    slot = t % 2

    @pl.when(t == 0)
    def _():
        # zero the shift buffers once: ring rows are never written afterwards
        b0_sc[...] = jnp.zeros_like(b0_sc)
        b1_sc[...] = jnp.zeros_like(b1_sc)
        start_dma(0, 0)

    @pl.when(t + 1 < nT)
    def _():
        start_dma(1 - slot, t + 1)

    pltpu.make_async_copy(xwin_sc.at[slot], xwin_sc.at[slot],
                          sem.at[slot, 0]).wait()

    r0, c0 = win_origin(t)
    dy0 = ty * th - r0   # core offset inside the window (0..2m at edges)
    dx0 = pl.multiple_of(tx * tw - c0, 8)

    # in-frame mask, flat [P,1]: global pixel (r0+i, c0+j) inside [0,H)x[0,W)
    idx = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    iy = idx // ww + r0
    ix = idx % ww + c0
    maskf = ((iy < H) & (ix < W)).astype(f32)
    if "nomask" in ablate:
        maskf = jnp.float32(1.0)

    # cond rides the dead channels 64:96 of the body tensor (one DMA
    # stream instead of two -- the decode is DMA-bound otherwise) and is
    # copied through to the output so the next block's window has it
    win = xwin_sc[slot].reshape(P, 128)
    xw = win[:, :_F]                                # bf16
    cond = win[:, _F:_F + _G]                       # bf16
    xwf = xw.astype(f32)

    def mm(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    def sft_pair(base):
        """scale/shift [P,64] f32; weight rows base..base+3 are
        (scale0, scale1, shift0, shift1) zero-padded to [32,64]."""
        h = _lrelu(mm(cond, sftm_ref[base + 0])
                   + sftb_ref[base + 0].reshape(1, -1))
        scale = mm(h[:, :_G].astype(bf16), sftm_ref[base + 1]) \
            + sftb_ref[base + 1].reshape(1, -1)
        h2 = _lrelu(mm(cond, sftm_ref[base + 2])
                    + sftb_ref[base + 2].reshape(1, -1))
        shift = mm(h2[:, :_G].astype(bf16), sftm_ref[base + 3]) \
            + sftb_ref[base + 3].reshape(1, -1)
        return scale, shift

    # dx-shift stores wrap at row boundaries in flat space: position
    # (i, 0)'s left tap would read (i-1, ww-1). For interior tiles that is
    # halo-ring garbage (absorbed), but at CLAMPED frame-edge tiles the
    # window edge IS the frame edge -- zero the wrap slots so edge taps
    # read exact SAME-pad zeros.
    col = idx % ww
    wrapL = (col != ww - 1).astype(bf16)   # d=0 store, row OFF+1+i
    wrapR = (col != 0).astype(bf16)        # d=2 store, row OFF-1+i

    def store_shifts(buf, y16, c):
        """Store a [P, c] source three times, dx-shifted: lane block d
        holds src[row - OFF + (d-1)]; wrap slots zeroed."""
        buf[pl.ds(OFF + 1, P), 0:c] = y16 * wrapL
        buf[pl.ds(OFF, P), c:2 * c] = y16
        buf[pl.ds(OFF - 1, P), 2 * c:3 * c] = y16 * wrapR

    # xc0 = sft0(x), masked so conv sources are exactly zero outside frame
    if "nosft" in ablate:
        xc0 = xwf * maskf
    else:
        scale, shift = sft_pair(0)
        xc0 = (xwf * (scale + 1.0) + shift) * maskf
    store_shifts(b0_sc, xc0.astype(bf16), _F)

    kr = (k0_ref, k1_ref, k2_ref, k3_ref, k4_ref)
    # grouped-source walk: source s contributes one wide matmul per dy to
    # every remaining target; acc[t] collects its slice. "bf16acc" keeps
    # the partial sums in bf16 (halves the value-chain register/spill
    # pressure; extra rounding quantified negligible -- see ops/s2d.py's
    # wide_dtype and tests/test_s2d.py)
    acc_dt = bf16 if "bf16acc" in ablate else f32
    acc = [None] * 5
    for s in range(5):
        buf = b0_sc if s == 0 else b1_sc
        c3 = 3 * (_F if s == 0 else _G)
        for dyi in range(3):
            row = OFF + (dyi - 1) * ww
            op = buf[pl.ds(row, P), 0:c3]
            wide = mm(op, kr[s][dyi]).astype(acc_dt)  # [P, _NW[s]]
            # (Mosaic requires 32-bit matmul acc; the cast shrinks the
            # live partial-sum chains when bf16acc is requested)
            o = 0
            for tgt in range(s, 5):
                cw = _COUT[tgt]
                sl = wide[:, o:o + cw]
                acc[tgt] = sl if acc[tgt] is None else acc[tgt] + sl
                o += cw
        # target s is complete: finalize and emit the next source
        y = acc[s].astype(f32) + bias_ref[s, 0:_COUT[s]].reshape(1, -1)
        if s < 4:
            y = (_lrelu(y) * maskf).astype(bf16)
            if s == 3 and "nosft" not in ablate:
                s1, s2 = sft_pair(4)
                y = ((y.astype(f32) * (s1[:, :_G] + 1.0) + s2[:, :_G])
                     * maskf).astype(bf16)
            store_shifts(b1_sc, y, _G)
        else:
            out = y * 0.2 + xwf                # dense-block residual
            if tail and "nosft" not in ablate:
                # fused RRDB tail: out = sft(out)*0.2 (+ x_rrdb below)
                sc1, sh1 = sft_pair(8)
                out = (out * (sc1 + 1.0) + sh1) * 0.2
            # core extraction at a dynamic (edge-tile) offset: Mosaic has
            # no dynamic_slice on VALUES, but dynamic REF reads are fine --
            # bounce through the consumed input window scratch
            ozero = jnp.zeros((P, 128 - _F - _G), bf16)
            full = jnp.concatenate([out.astype(bf16), cond, ozero], axis=1)
            out3 = full.reshape(wh, ww, 128)
            xwin_sc[slot] = out3
            core = xwin_sc[slot, pl.ds(dy0, th), pl.ds(dx0, tw), :]
            if tail:
                core = core + jnp.pad(xin_ref[..., :_F],
                                      ((0, 0), (0, 0), (0, 128 - _F)))
            out_ref[...] = core


def pack_rdb_weights(rdb_params, rrdb_sft=None):
    """Pack one dense block's weights for the fused kernel.

    Returns (k0..k4 as [3, 3*c_s, NW_s] bf16 -- dx folded into K, targets
    >= s concatenated on N --, bias [5,64] f32, sft mats [12,32,64] bf16
    zero-padded, sft biases [12,64] f32). Rows 8..11 of the SFT pack hold
    the RRDB-level trailing SFT when ``rrdb_sft`` is given.
    """
    cum = [0, _F, _F + _G, _F + 2 * _G, _F + 3 * _G]
    ks = [jnp.asarray(rdb_params[f"conv{i + 1}"]["kernel"]) for i in range(5)]
    packed_k = []
    for s in range(5):
        c = _F if s == 0 else _G
        blocks = []
        for d in range(3):  # dx block
            blocks.append(jnp.concatenate(
                [ks[t][:, d, cum[s]:cum[s] + c, :] for t in range(s, 5)],
                axis=-1))                        # [3(dy), c, NW_s]
        kd = jnp.concatenate(blocks, axis=1)     # [3, 3c, NW_s]
        packed_k.append(kd.astype(jnp.bfloat16))
    bias = jnp.zeros((5, 64), jnp.float32)
    for i in range(5):
        b = rdb_params[f"conv{i + 1}"]["bias"]
        bias = bias.at[i, : b.shape[0]].set(jnp.asarray(b, jnp.float32))
    sftm = jnp.zeros((12, 32, 64), jnp.bfloat16)
    sftb = jnp.zeros((12, 64), jnp.float32)
    packs = [rdb_params["sft0"], rdb_params["sft1"]]
    if rrdb_sft is not None:
        packs.append(rrdb_sft)
    for si, sp in enumerate(packs):
        for wi, wname in enumerate(("scale0", "scale1", "shift0", "shift1")):
            k = jnp.asarray(sp[wname]["kernel"])[0, 0]
            b = jnp.asarray(sp[wname]["bias"], jnp.float32)
            sftm = sftm.at[4 * si + wi, : k.shape[0], : k.shape[1]].set(
                k.astype(jnp.bfloat16))
            sftb = sftb.at[4 * si + wi, : b.shape[0]].set(b)
    return tuple(packed_k), bias, sftm, sftb


_HALO_R = 16  # whole-RRDB fusion: 3 blocks x 5 convs = 15 px + alignment


def pack_rrdb_weights(body_params):
    """Stack one RRDB's three dense-block packs on a leading rdb axis:
    ks[s] [3, 3, 3c_s, NW_s], bias [3,5,64], sftm [3,12,32,64],
    sftb [3,12,64].  rdb3's SFT rows 8..11 hold the RRDB trailing SFT."""
    packs = [pack_rdb_weights(body_params[f"rdb{j}"],
                              rrdb_sft=body_params["sft0"] if j == 3 else None)
             for j in (1, 2, 3)]
    ks = tuple(jnp.stack([p[0][s] for p in packs]) for s in range(5))
    bias = jnp.stack([p[1] for p in packs])
    sftm = jnp.stack([p[2] for p in packs])
    sftb = jnp.stack([p[3] for p in packs])
    return ks, bias, sftm, sftb


def _rrdb_kernel(xw_ref, k0_ref, k1_ref, k2_ref, k3_ref, k4_ref,
                 bias_ref, sftm_ref, sftb_ref, out_ref,
                 xwin_sc, b0_sc, b1_sc, sem,
                 *, th: int, tw: int, H: int, W: int, ny: int, nx: int,
                 Hq: int, Wq: int):
    """Whole-RRDB fusion: one program runs a tile through all THREE dense
    blocks plus the RRDB trailing SFT and both residuals (vs 3 programs +
    3 HBM round trips of the body tensor for the per-RDB kernel).  The
    window halo is sized to the full receptive field (15 px); the
    intermediate invalid ring is recomputed rather than exchanged --
    overlapping compute is cheaper than the per-program overhead it
    replaces.  Math identical to :func:`_rdb_kernel` applied three times
    (shrinking-valid-region argument; parity-tested)."""
    m = _HALO_R
    wh, ww = th + 2 * m, tw + 2 * m
    P = wh * ww
    OFF = _off(ww)
    f32 = jnp.float32
    bf16 = jnp.bfloat16

    ty = pl.program_id(0)
    tx = pl.program_id(1)
    t = ty * nx + tx
    nT = ny * nx

    def win_origin(tt):
        r0 = pl.multiple_of(jnp.clip((tt // nx) * th - m, 0, Hq - wh), 8)
        c0 = pl.multiple_of(jnp.clip((tt % nx) * tw - m, 0, Wq - ww), 8)
        return r0, c0

    def start_dma(slot, tt):
        r0, c0 = win_origin(tt)
        pltpu.make_async_copy(
            xw_ref.at[pl.ds(r0, wh), pl.ds(c0, ww), :],
            xwin_sc.at[slot], sem.at[slot, 0]).start()

    slot = t % 2

    @pl.when(t == 0)
    def _():
        b0_sc[...] = jnp.zeros_like(b0_sc)
        b1_sc[...] = jnp.zeros_like(b1_sc)
        start_dma(0, 0)

    @pl.when(t + 1 < nT)
    def _():
        start_dma(1 - slot, t + 1)

    pltpu.make_async_copy(xwin_sc.at[slot], xwin_sc.at[slot],
                          sem.at[slot, 0]).wait()

    r0, c0 = win_origin(t)
    dy0 = ty * th - r0
    dx0 = pl.multiple_of(tx * tw - c0, 8)

    idx = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    iy = idx // ww + r0
    ix = idx % ww + c0
    maskf = ((iy < H) & (ix < W)).astype(f32)

    win = xwin_sc[slot].reshape(P, 128)
    cond = win[:, _F:_F + _G]
    x0 = win[:, :_F].astype(f32)

    def mm(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    def sft_pair(r, base):
        h = _lrelu(mm(cond, sftm_ref[r, base + 0])
                   + sftb_ref[r, base + 0].reshape(1, -1))
        scale = mm(h[:, :_G].astype(bf16), sftm_ref[r, base + 1]) \
            + sftb_ref[r, base + 1].reshape(1, -1)
        h2 = _lrelu(mm(cond, sftm_ref[r, base + 2])
                    + sftb_ref[r, base + 2].reshape(1, -1))
        shift = mm(h2[:, :_G].astype(bf16), sftm_ref[r, base + 3]) \
            + sftb_ref[r, base + 3].reshape(1, -1)
        return scale, shift

    col = idx % ww
    wrapL = (col != ww - 1).astype(bf16)
    wrapR = (col != 0).astype(bf16)

    def store_shifts(buf, y16, c):
        buf[pl.ds(OFF + 1, P), 0:c] = y16 * wrapL
        buf[pl.ds(OFF, P), c:2 * c] = y16
        buf[pl.ds(OFF - 1, P), 2 * c:3 * c] = y16 * wrapR

    kr = (k0_ref, k1_ref, k2_ref, k3_ref, k4_ref)
    x = x0
    for r in range(3):
        scale, shift = sft_pair(r, 0)
        xc0 = (x * (scale + 1.0) + shift) * maskf
        store_shifts(b0_sc, xc0.astype(bf16), _F)
        acc = [None] * 5
        for s in range(5):
            buf = b0_sc if s == 0 else b1_sc
            c3 = 3 * (_F if s == 0 else _G)
            for dyi in range(3):
                row = OFF + (dyi - 1) * ww
                op = buf[pl.ds(row, P), 0:c3]
                wide = mm(op, kr[s][r, dyi])          # [P, NW_s] f32
                o = 0
                for tgt in range(s, 5):
                    cw = _COUT[tgt]
                    sl = wide[:, o:o + cw]
                    acc[tgt] = sl if acc[tgt] is None else acc[tgt] + sl
                    o += cw
            y = acc[s] + bias_ref[r, s, 0:_COUT[s]].reshape(1, -1)
            if s < 4:
                y = (_lrelu(y) * maskf).astype(bf16)
                if s == 3:
                    s1, s2 = sft_pair(r, 4)
                    y = ((y.astype(f32) * (s1[:, :_G] + 1.0) + s2[:, :_G])
                         * maskf).astype(bf16)
                store_shifts(b1_sc, y, _G)
            else:
                x = y * 0.2 + x                        # dense-block residual
    sc1, sh1 = sft_pair(2, 8)                          # RRDB trailing SFT
    out = (x * (sc1 + 1.0) + sh1) * 0.2 + x0           # RRDB residual

    ozero = jnp.zeros((P, 128 - _F - _G), bf16)
    full = jnp.concatenate([out.astype(bf16), cond, ozero], axis=1)
    xwin_sc[slot] = full.reshape(wh, ww, 128)
    out_ref[...] = xwin_sc[slot, pl.ds(dy0, th), pl.ds(dx0, tw), :]


def rrdb_apply_pallas(body, packed, *, H: int, W: int, th: int, tw: int,
                      interpret: bool = False):
    """Apply one whole fused RRDB (3 dense blocks + trailing SFT +
    residuals) in a single pallas_call.  Same tiling contract as
    :func:`rdb_apply_pallas` but with the 3-block halo (requires
    Hq >= th+2*_HALO_R, Wq >= tw+2*_HALO_R)."""
    m = _HALO_R
    Hq, Wq, _ = body.shape
    ny, nx = Hq // th, Wq // tw
    wh, ww = th + 2 * m, tw + 2 * m
    if th % 8 or tw % 16 or Hq < wh or Wq < ww:
        raise ValueError(f"bad rrdb tiling th={th} tw={tw} Hq={Hq} Wq={Wq}")
    P = wh * ww
    PB = _off(ww) + P + ww + 16
    ks, bias, sftm, sftb = packed

    kernel = functools.partial(_rrdb_kernel, th=th, tw=tw, H=H, W=W,
                               ny=ny, nx=nx, Hq=Hq, Wq=Wq)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    tile_spec = pl.BlockSpec((th, tw, 128), lambda ty, tx: (ty, tx, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(ny, nx),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)]
        + [vspec] * 8,
        out_specs=tile_spec,
        out_shape=jax.ShapeDtypeStruct((Hq, Wq, 128), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, wh, ww, 128), jnp.bfloat16),
            pltpu.VMEM((PB, 3 * _F), jnp.bfloat16),
            pltpu.VMEM((PB, 3 * _G), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, 1)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(body, *ks, bias, sftm, sftb)


def rdb_apply_pallas(body, packed, *, H: int, W: int, th: int,
                     tw: int, xin=None, interpret: bool = False,
                     ablate: str = ""):
    """Apply one fused dense block.

    body: [Hq, Wq, 128] bf16 carrying the features in channels 0:64 and
    the SFT condition in 64:96 (the kernel copies the condition through
    to its output, so the packing survives the whole body);
    xin: [Hq, Wq, 128] RRDB residual input -- when given this call is the
    RRDB's third block and the trailing SFT + residual are fused in.
    Requires th % 8 == 0, tw % 16 == 0, Hq >= th+2m, Wq >= tw+2m.
    """
    m = _HALO
    Hq, Wq, _ = body.shape
    ny, nx = Hq // th, Wq // tw
    wh, ww = th + 2 * m, tw + 2 * m
    if th % 8 or tw % 16 or Hq < wh or Wq < ww:
        raise ValueError(f"bad tiling th={th} tw={tw} Hq={Hq} Wq={Wq}")
    P = wh * ww
    PB = _off(ww) + P + ww + 16
    ks, bias, sftm, sftb = packed
    tail = xin is not None

    kernel = functools.partial(_rdb_kernel, th=th, tw=tw, H=H, W=W,
                               ny=ny, nx=nx, Hq=Hq, Wq=Wq, tail=tail,
                               ablate=ablate)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    tile_spec = pl.BlockSpec((th, tw, 128), lambda ty, tx: (ty, tx, 0),
                             memory_space=pltpu.VMEM)
    # non-tail calls never read xin: give it a dummy operand so the
    # pipeline doesn't stream a dead [th,tw,128] block per tile (~2 GB of
    # wasted DMA per frame across the 10 non-tail calls)
    xin_spec = tile_spec if tail else vspec
    xin_op = xin if tail else jnp.zeros((8, 16, 128), jnp.bfloat16)
    return pl.pallas_call(
        kernel,
        grid=(ny, nx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # x+cond (manual halo DMA)
            xin_spec,                               # xin (core tiles / dummy)
            vspec, vspec, vspec, vspec, vspec,      # k0..k4
            vspec, vspec, vspec,                    # bias, sftm, sftb
        ],
        out_specs=tile_spec,
        out_shape=jax.ShapeDtypeStruct((Hq, Wq, 128), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, wh, ww, 128), jnp.bfloat16),
            pltpu.VMEM((PB, 3 * _F), jnp.bfloat16),
            pltpu.VMEM((PB, 3 * _G), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, 1)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(body, xin_op, *ks, bias, sftm, sftb)


def _conv(p, a, bf16=jnp.bfloat16):
    return jax.lax.conv_general_dilated(
        a, jnp.asarray(p["kernel"], bf16), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(bf16) \
        + jnp.asarray(p["bias"], bf16)


def sftnet_apply_pallas(params, x, cond, *, scale: int = 4,
                        num_block: int = 5, th: int = 48, tw: int = 128,
                        interpret: bool = False, upchain: str = "materialized",
                        fuse_rrdb: bool = False, ablate: str = ""):
    """Full SFTNet eval forward with the fused Pallas body.

    Mirrors ``SFTNet.__call__`` (models/sr_esrnet.py) / the reference graph
    (lib/sr_esrnet.py:446-465). Head convs and the x4 upsample tail run as
    XLA bf16 ops (the tail via the phase-decomposed upsample convs of
    ops/s2d.py); the 15 dense blocks run fused, with each RRDB's trailing
    SFT + residual folded into its third block's kernel call.

    x: [1, H, W, Cin]; cond: [1, H, W, num_cond]. Returns f32.
    """
    bf = jnp.bfloat16
    H, W = x.shape[1], x.shape[2]
    x16, c16 = x.astype(bf), cond.astype(bf)

    feat = _conv(params["conv_first"], x16)
    c = _conv(params["cond0"], c16)
    for nm in ("cond1", "cond2", "cond3"):
        c = (_lrelu(c) @ jnp.asarray(params[nm]["kernel"], bf)[0, 0]
             + jnp.asarray(params[nm]["bias"], bf))

    ny, nx = math.ceil(H / th), math.ceil(W / tw)
    Hq, Wq = ny * th, nx * tw
    packed_bc = jnp.concatenate(
        [feat[0], c[0], jnp.zeros((H, W, 128 - _F - _G), bf)], axis=-1)
    body = jnp.pad(packed_bc, ((0, Hq - H), (0, Wq - W), (0, 0)))

    for i in range(num_block):
        bp = params[f"body{i}"]
        if fuse_rrdb:
            body = rrdb_apply_pallas(body, pack_rrdb_weights(bp),
                                     H=H, W=W, th=th, tw=tw,
                                     interpret=interpret)
            continue
        xin = body
        cur = body
        for j in (1, 2):
            cur = rdb_apply_pallas(cur,
                                   pack_rdb_weights(bp[f"rdb{j}"]),
                                   H=H, W=W, th=th, tw=tw,
                                   interpret=interpret, ablate=ablate)
        body = rdb_apply_pallas(
            cur, pack_rdb_weights(bp["rdb3"], rrdb_sft=bp["sft0"]),
            H=H, W=W, th=th, tw=tw, xin=xin, interpret=interpret,
            ablate=ablate)

    cond_core = body[:H, :W, _F:_F + _G]
    body = body[:H, :W, :_F]

    def sft_xla(sp, x3, cond3):
        def m1(pp, a):
            return (a @ jnp.asarray(pp["kernel"], bf)[0, 0]
                    + jnp.asarray(pp["bias"], bf))
        sc = m1(sp["scale1"], _lrelu(m1(sp["scale0"], cond3)))
        sh = m1(sp["shift1"], _lrelu(m1(sp["shift0"], cond3)))
        return x3 * (sc + 1.0) + sh

    body = sft_xla(params["sftbody"], body, cond_core)
    body = _conv(params["conv_body"], body[None]) + feat

    def up2(a):
        return jnp.repeat(jnp.repeat(a, 2, axis=1), 2, axis=2)

    if scale > 1:
        if upchain == "dilated":
            # exact lhs_dilation=2 form (ops/s2d.py::conv_up_dilated):
            # reads the 1x-res input directly, no materialized up2 tensor
            from fourk_nerf_tpu.ops import s2d as _s2d

            body = _lrelu(_s2d.conv_up_dilated(
                body[None] if body.ndim == 3 else body,
                jnp.asarray(params["conv_up1"]["kernel"], bf),
                jnp.asarray(params["conv_up1"]["bias"], bf)))
            if scale == 4:
                body = _lrelu(_s2d.conv_up_dilated(
                    body, jnp.asarray(params["conv_up2"]["kernel"], bf),
                    jnp.asarray(params["conv_up2"]["bias"], bf)))
        else:
            # nearest-up + conv: measured FASTER than both the
            # phase-decomposed XLA form (pixel-shuffle relayouts don't
            # fuse) and the fused uptail kernel below (per-tile overheads
            # at 4x the tile count)
            body = _lrelu(_conv(params["conv_up1"], up2(body)))
            if scale == 4:
                body = _lrelu(_conv(params["conv_up2"], up2(body)))
    out = _lrelu(_conv(params["conv_hr"], body))
    k = jnp.asarray(params["conv_last"]["kernel"], bf)
    out = jax.lax.conv_general_dilated(
        out, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) \
        + jnp.asarray(params["conv_last"]["bias"], jnp.float32)
    return out.astype(jnp.float32)


#: jitted entry for eval drivers: one dispatch for head + 15 fused blocks +
#: tail (eager per-op dispatch costs a tunnel round trip each on remote TPU)
sftnet_apply_pallas_jit = jax.jit(
    sftnet_apply_pallas,
    static_argnames=("scale", "num_block", "th", "tw", "interpret",
                     "upchain", "fuse_rrdb"))



# ---------------------------------------------------------------------------
# Fused x4 upsample tail: conv_up2 (nearest-up2 + 3x3) -> conv_hr -> conv_last
# ---------------------------------------------------------------------------

def _uptail_kernel(xw_ref, kup_ref, khr_ref, klast_ref, bias_ref, out_ref,
                   xwin_sc, b64_sc, b256_sc, sem,
                   *, th: int, tw: int, H2: int, W2: int, ny: int, nx: int,
                   Hq: int, Wq: int, ablate: str = ""):
    """One program per (ty, tx) tile of the 2x-resolution feature map.

    Computes lrelu(conv_up2(nearest_up2(x))) -> lrelu(conv_hr) -> conv_last
    entirely in VMEM, in the PHASE domain: the up2+conv is four 2x2 phase
    convs on x (ops/s2d.py:up_phase_kernels) and the two 4x-resolution 3x3
    convs become s2d-domain convs over the 256-channel phase tensor -- so
    nothing ever materializes at 4x in HBM. Output is the s2d form of the
    RGB frame ([*, 16], 12 live channels); the caller pixel-shuffles.

    Same conv formulation as :func:`_rdb_kernel` (dx-shift lane-concat
    buffers, aligned dy row offsets, frame-edge masking).

    STATUS: parity-tested capability, NOT the production path -- measured
    ~134 ms at fern 2x scale vs ~91 ms for the naive XLA upchain (the
    per-tile kernel overhead outweighs the saved 4x-res HBM traffic at
    4x the tile count). Kept for smaller-VMEM parts and as the starting
    point for a lower-overhead revision; production uses the XLA upchain
    (see sftnet_apply_pallas).
    """
    m = _HALO
    wh, ww = th + 2 * m, tw + 2 * m
    P = wh * ww
    OFF = _off(ww)
    f32 = jnp.float32
    bf16 = jnp.bfloat16

    ty = pl.program_id(0)
    tx = pl.program_id(1)
    t = ty * nx + tx
    nT = ny * nx

    def win_origin(tt):
        r0 = pl.multiple_of(jnp.clip((tt // nx) * th - m, 0, Hq - wh), 8)
        c0 = pl.multiple_of(jnp.clip((tt % nx) * tw - m, 0, Wq - ww), 8)
        return r0, c0

    def start_dma(slot, tt):
        r0, c0 = win_origin(tt)
        pltpu.make_async_copy(
            xw_ref.at[pl.ds(r0, wh), pl.ds(c0, ww), :],
            xwin_sc.at[slot], sem.at[slot]).start()

    slot = t % 2

    @pl.when(t == 0)
    def _():
        b64_sc[...] = jnp.zeros_like(b64_sc)
        b256_sc[...] = jnp.zeros_like(b256_sc)
        start_dma(0, 0)

    @pl.when(t + 1 < nT)
    def _():
        start_dma(1 - slot, t + 1)

    pltpu.make_async_copy(xwin_sc.at[slot], xwin_sc.at[slot],
                          sem.at[slot]).wait()

    r0, c0 = win_origin(t)
    dy0 = ty * th - r0
    dx0 = pl.multiple_of(tx * tw - c0, 8)

    idx = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    iy = idx // ww + r0
    ix = idx % ww + c0
    maskf = ((iy < H2) & (ix < W2)).astype(f32)

    xw = xwin_sc[slot].reshape(P, 128)[:, :_F]

    def mm(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    col = idx % ww
    wrapL = (col != ww - 1).astype(bf16)
    wrapR = (col != 0).astype(bf16)

    def store_shifts(buf, y16, c):
        # wrap slots zeroed: see _rdb_kernel (frame-edge exactness)
        buf[pl.ds(OFF + 1, P), 0:c] = y16 * wrapL
        buf[pl.ds(OFF, P), c:2 * c] = y16
        buf[pl.ds(OFF - 1, P), 2 * c:3 * c] = y16 * wrapR

    store_shifts(b64_sc, (xw.astype(f32) * maskf).astype(bf16), _F)

    # phase conv_up2: z[(q), d] over 4 output phases, each two dy taps
    zs = []
    for qy in range(2):
        for qx in range(2):
            acc = None
            for dyi in range(2):
                row = OFF + (dyi - (1 - qy)) * ww
                op = b64_sc[pl.ds(row, P), 0:3 * _F]
                d = mm(op, kup_ref[2 * qy + qx, dyi])
                acc = d if acc is None else acc + d
            z = _lrelu(acc + bias_ref[0, 0:_F].reshape(1, -1)) * maskf
            zs.append(z.astype(bf16))
    z = jnp.concatenate(zs, axis=1)            # [P, 256] phase-major
    if "dumpz" in ablate:
        xwin_sc[slot] = jnp.pad(z[:, :16], ((0, 0), (0, 112))) \
            .reshape(wh, ww, 128)
        out_ref[...] = xwin_sc[slot, pl.ds(dy0, th), pl.ds(dx0, tw), 0:16]
        return
    store_shifts(b256_sc, z, 4 * _F)

    # conv_hr in the s2d domain
    acc = None
    for dyi in range(3):
        row = OFF + (dyi - 1) * ww
        op = b256_sc[pl.ds(row, P), 0:12 * _F]
        d = mm(op, khr_ref[dyi])
        acc = d if acc is None else acc + d
    h = (_lrelu(acc + bias_ref[1].reshape(1, -1)) * maskf).astype(bf16)
    store_shifts(b256_sc, h, 4 * _F)

    # conv_last in the s2d domain -> [P, 16] (12 live: 4 phases x RGB)
    acc = None
    for dyi in range(3):
        row = OFF + (dyi - 1) * ww
        op = b256_sc[pl.ds(row, P), 0:12 * _F]
        d = mm(op, klast_ref[dyi])
        acc = d if acc is None else acc + d
    rgb = acc + bias_ref[2, 0:16].reshape(1, -1)

    xwin_sc[slot] = jnp.pad(rgb.astype(bf16), ((0, 0), (0, 112))) \
        .reshape(wh, ww, 128)
    out_ref[...] = xwin_sc[slot, pl.ds(dy0, th), pl.ds(dx0, tw), 0:16]


def pack_uptail_weights(params):
    """(kup [4,2,192,64], khr [3,768,256], klast [3,768,16] bf16,
    bias [3,256] f32) from conv_up2/conv_hr/conv_last params."""
    from fourk_nerf_tpu.ops import s2d as s2d_mod

    bf = jnp.bfloat16
    kq = s2d_mod.up_phase_kernels(
        jnp.asarray(params["conv_up2"]["kernel"]))  # [qy,qx,dy',dx',c,d]
    kup = jnp.zeros((4, 2, 3 * _F, _F))
    for qy in range(2):
        for qx in range(2):
            for dyi in range(2):
                for d in range(3):
                    dxp = d - qx
                    if 0 <= dxp <= 1:
                        kup = kup.at[2 * qy + qx, dyi,
                                     d * _F:(d + 1) * _F, :].set(
                            kq[qy, qx, dyi, dxp])

    def fold(k3):  # [3,3,C,D] -> [3, 3C, D]
        return jnp.concatenate([k3[:, d] for d in range(3)], axis=1)

    khr = fold(s2d_mod.s2d_kernel(jnp.asarray(params["conv_hr"]["kernel"])))
    kl = fold(s2d_mod.s2d_kernel(jnp.asarray(params["conv_last"]["kernel"])))
    kl = jnp.pad(kl, ((0, 0), (0, 0), (0, 16 - kl.shape[-1])))
    bias = jnp.zeros((3, 256), jnp.float32)
    bias = bias.at[0, :_F].set(jnp.asarray(params["conv_up2"]["bias"],
                                           jnp.float32))
    bias = bias.at[1].set(jnp.tile(jnp.asarray(params["conv_hr"]["bias"],
                                               jnp.float32), 4))
    bias = bias.at[2, :12].set(jnp.tile(jnp.asarray(
        params["conv_last"]["bias"], jnp.float32), 4))
    return kup.astype(bf), khr.astype(bf), kl.astype(bf), bias


def uptail_apply_pallas(up1_out, packed, *, th: int = 32, tw: int = 128,
                        interpret: bool = False, ablate: str = ""):
    """[1, H2, W2, 64] (post-lrelu conv_up1 output) -> [1, 2*H2, 2*W2, 3]
    f32, fusing conv_up2 + conv_hr + conv_last without any 4x-resolution
    HBM tensor."""
    from fourk_nerf_tpu.ops import s2d as s2d_mod

    m = _HALO
    H2, W2 = up1_out.shape[1], up1_out.shape[2]
    ny, nx = math.ceil(H2 / th), math.ceil(W2 / tw)
    Hq, Wq = ny * th, nx * tw
    wh, ww = th + 2 * m, tw + 2 * m
    if th % 8 or tw % 16 or Hq < wh or Wq < ww:
        raise ValueError(f"bad tiling th={th} tw={tw} Hq={Hq} Wq={Wq}")
    P = wh * ww
    PB = _off(ww) + P + ww + 16
    kup, khr, kl, bias = packed

    x = jnp.pad(up1_out[0].astype(jnp.bfloat16),
                ((0, Hq - H2), (0, Wq - W2), (0, 128 - _F)))
    kernel = functools.partial(_uptail_kernel, th=th, tw=tw, H2=H2, W2=W2,
                               ny=ny, nx=nx, Hq=Hq, Wq=Wq, ablate=ablate)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(ny, nx),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  vspec, vspec, vspec, vspec],
        out_specs=pl.BlockSpec((th, tw, 16), lambda ty, tx: (ty, tx, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hq, Wq, 16), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, wh, ww, 128), jnp.bfloat16),
            pltpu.VMEM((PB, 3 * _F), jnp.bfloat16),
            pltpu.VMEM((PB, 12 * _F), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(x, kup, khr, kl, bias)
    rgb = s2d_mod.d2s(out[None, :, :, :12].astype(jnp.float32))
    return rgb[:, : 2 * H2, : 2 * W2]

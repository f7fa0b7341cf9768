"""Fused SFTNet body: one Pallas kernel per ResidualDenseBlock_SFT.

The VC-Decoder's RRDB_SFT body (reference /root/reference/lib/sr_esrnet.py:
126-182,446-465) is 15 dense-block applications per frame; under XLA every
dense conv round-trips activations through HBM and the 32-channel growth
width underfills the 128-lane MXU, leaving the 4K decode bandwidth-bound
(~430 ms of a ~550 ms fern frame). Here one whole dense block runs per
pallas_call: a halo'd spatial tile is DMA'd into VMEM once (double-buffered
across the tile grid), all five dense convs + both SFT layers + the
residual run out of a channel-concatenated VMEM source buffer, and only the
tile core is written back -- zero HBM traffic for intermediates.

Conv formulation: activations live in FLATTENED pixel space [P, C] with a
zero ring of ``ww+1`` rows on both ends; a 3x3 SAME conv is nine
statically-offset ``[P, Cin] @ [Cin, Cout]`` MXU matmuls (offset
``(dy-1)*ww + (dx-1)``). Row-wrap contamination (pixel (i,0) reading
(i-1, ww-1)) only touches the window edge ring, which the 5-deep halo
absorbs. Exact per-layer zero-pad semantics at the TRUE frame boundary are
restored by masking activations outside ``[0,H)x[0,W)`` after every
nonlinearity -- so the fused body is exact for any tile split, including
frames that don't divide the tile size.

Eval path only (the joint trainer's patch-sized body stays on the
differentiable XLA path); numerics match the XLA bf16 body to bf16
rounding, with f32 conv accumulation in both.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HALO = 8   # >= 5 (five 3x3 convs deep per dense block); 8 keeps the DMA
            # window width tw+2*_HALO aligned to the HBM (8,128) tiling
_F = 64     # num_feat
_G = 32     # num_grow_ch / SFT hidden width


def _lrelu(x):
    return jnp.where(x >= 0, x, 0.2 * x)


def _rdb_kernel(xw_ref, cond_ref, k1_ref, k2_ref, k3_ref, k4_ref, k5_ref,
                bias_ref, sftm_ref, sftb_ref, out_ref,
                xwin_sc, cond_sc, srcs_sc, sem,
                *, th: int, tw: int, H: int, W: int, ny: int, nx: int,
                ablate: str = ""):
    """One program per (ty, tx) tile. See module docstring."""
    m = _HALO
    wh, ww = th + 2 * m, tw + 2 * m
    P = wh * ww
    OFF = ww + 1
    f32 = jnp.float32
    bf16 = jnp.bfloat16

    ty = pl.program_id(0)
    tx = pl.program_id(1)
    t = ty * nx + tx
    nT = ny * nx

    def start_dma(slot, tt):
        r0 = (tt // nx) * th
        c0 = (tt % nx) * tw
        pltpu.make_async_copy(
            xw_ref.at[pl.ds(r0, wh), pl.ds(c0, ww), :],
            xwin_sc.at[slot], sem.at[slot, 0]).start()
        pltpu.make_async_copy(
            cond_ref.at[pl.ds(r0, wh), pl.ds(c0, ww), :],
            cond_sc.at[slot], sem.at[slot, 1]).start()

    slot = t % 2

    @pl.when(t == 0)
    def _():
        # zero the whole source buffer once: the pad ring rows are never
        # written afterwards (center writes stay in [OFF, OFF+P))
        srcs_sc[...] = jnp.zeros_like(srcs_sc)
        start_dma(0, 0)

    @pl.when(t + 1 < nT)
    def _():
        start_dma(1 - slot, t + 1)

    pltpu.make_async_copy(xwin_sc.at[slot], xwin_sc.at[slot],
                          sem.at[slot, 0]).wait()
    pltpu.make_async_copy(cond_sc.at[slot], cond_sc.at[slot],
                          sem.at[slot, 1]).wait()

    # in-frame mask in padded-array coords: window local (i,j) sits at
    # padded row ty*th + i; true frame pixels occupy [m, m+H) x [m, m+W).
    # Built directly in flat [P,1] space -- Mosaic can't shape-cast a
    # [wh,ww] vector to [P,1] (the lane dim changes).
    idx = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    iy = idx // ww + ty * th
    ix = idx % ww + tx * tw
    inb = (iy >= m) & (iy < m + H) & (ix >= m) & (ix < m + W)
    maskf = inb.astype(f32)
    if "nomask" in ablate:
        maskf = jnp.float32(1.0)

    # windows are DMA'd at 128 channels (HBM manual-DMA slices must align
    # to the (8,128) tiling); the live channels are a lane slice
    xw = xwin_sc[slot].reshape(P, 128)[:, :_F]      # bf16
    cond = cond_sc[slot].reshape(P, 128)[:, :_G]    # bf16
    xwf = xw.astype(f32)

    def mm(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    def sft_pair(base):
        """scale/shift [P, 64] f32 from cond; weight rows ``base..base+3``
        are (scale0, scale1, shift0, shift1), zero-padded to [32, 64]."""
        h = _lrelu(mm(cond, sftm_ref[base + 0])
                   + sftb_ref[base + 0].reshape(1, -1))
        scale = mm(h[:, :_G].astype(bf16), sftm_ref[base + 1]) \
            + sftb_ref[base + 1].reshape(1, -1)
        h2 = _lrelu(mm(cond, sftm_ref[base + 2])
                    + sftb_ref[base + 2].reshape(1, -1))
        shift = mm(h2[:, :_G].astype(bf16), sftm_ref[base + 3]) \
            + sftb_ref[base + 3].reshape(1, -1)
        return scale, shift

    # xc0 = sft0(x): masked so conv sources are exactly zero outside frame
    if "nosft" in ablate:
        xc0 = xwf * maskf
    else:
        scale, shift = sft_pair(0)
        xc0 = (xwf * (scale + 1.0) + shift) * maskf
    srcs_sc[pl.ds(OFF, P), 0:_F] = xc0.astype(bf16)

    taps = [(dy - 1) * ww + (dx - 1) for dy in range(3) for dx in range(3)]
    if "aligntaps" in ablate:   # perf ablation: wrong numerics, aligned reads
        taps = [(i - 4) * 16 for i in range(9)]
    if "onetap" in ablate:
        taps = [0]
    kr = (k1_ref, k2_ref, k3_ref, k4_ref, k5_ref)
    for tgt in range(5):
        cin = _F + _G * tgt
        cout = _F if tgt == 4 else _G
        acc = None
        for ti, off in enumerate(taps):
            a = srcs_sc[pl.ds(OFF + off, P), 0:cin]
            d = mm(a, kr[tgt][ti])
            acc = d if acc is None else acc + d
        acc = acc + bias_ref[tgt, 0:cout].reshape(1, cout)
        if tgt == 4:
            out = acc * 0.2 + xwf
            out3 = out.reshape(wh, ww, _F)[m:m + th, m:m + tw, :]
            out_ref[...] = out3.astype(out_ref.dtype)
        else:
            y = (_lrelu(acc) * maskf).astype(bf16)
            if tgt == 3 and "nosft" not in ablate:
                s1, s2 = sft_pair(4)
                y = ((y.astype(f32) * (s1[:, :_G] + 1.0) + s2[:, :_G])
                     * maskf).astype(bf16)
            srcs_sc[pl.ds(OFF, P), cin:cin + _G] = y


def pack_rdb_weights(rdb_params):
    """(k1..k5 as [9,cin,cout] bf16, bias [5,64] f32, sft mats [8,32,64]
    bf16 zero-padded, sft biases [8,64] f32) from a ResidualDenseBlockSFT
    param subtree."""
    ks = []
    bias = jnp.zeros((5, 64), jnp.float32)
    for i in range(5):
        k = rdb_params[f"conv{i + 1}"]["kernel"]
        ks.append(jnp.asarray(k).reshape(9, k.shape[2], k.shape[3])
                  .astype(jnp.bfloat16))
        b = rdb_params[f"conv{i + 1}"]["bias"]
        bias = bias.at[i, : b.shape[0]].set(jnp.asarray(b, jnp.float32))
    sftm = jnp.zeros((8, 32, 64), jnp.bfloat16)
    sftb = jnp.zeros((8, 64), jnp.float32)
    for si, sname in enumerate(("sft0", "sft1")):
        sp = rdb_params[sname]
        for wi, wname in enumerate(("scale0", "scale1", "shift0", "shift1")):
            k = jnp.asarray(sp[wname]["kernel"])[0, 0]  # 1x1 conv -> [ci,co]
            b = jnp.asarray(sp[wname]["bias"], jnp.float32)
            sftm = sftm.at[4 * si + wi, : k.shape[0], : k.shape[1]].set(
                k.astype(jnp.bfloat16))
            sftb = sftb.at[4 * si + wi, : b.shape[0]].set(b)
    return ks, bias, sftm, sftb


def rdb_apply_pallas(body, condp, packed, *, H: int, W: int, th: int,
                     tw: int, interpret: bool = False, ablate: str = ""):
    """Apply one fused dense block.

    body: [Hq, Wq, 64] bf16 core layout (Hq = ny*th >= H);
    condp: [Hq+2m, Wq+2m, 128] bf16, channels zero-padded to the 128-lane
    HBM tiling (built once per frame);
    packed: output of :func:`pack_rdb_weights`.
    """
    m = _HALO
    Hq, Wq, _ = body.shape
    ny, nx = Hq // th, Wq // tw
    wh, ww = th + 2 * m, tw + 2 * m
    P = wh * ww
    PB = P + 2 * (ww + 1)
    PB += (-PB) % 16
    ks, bias, sftm, sftb = packed

    # spatial halo + channel pad to the 128-lane HBM tiling in ONE pass
    xw = jnp.pad(body, ((m, m), (m, m), (0, 128 - _F)))
    kernel = functools.partial(_rdb_kernel, th=th, tw=tw, H=H, W=W,
                               ny=ny, nx=nx, ablate=ablate)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(ny, nx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # x (manual halo DMA)
            pl.BlockSpec(memory_space=pltpu.HBM),   # cond
            vspec, vspec, vspec, vspec, vspec,      # k1..k5
            vspec, vspec, vspec,                    # bias, sftm, sftb
        ],
        out_specs=pl.BlockSpec((th, tw, _F), lambda ty, tx: (ty, tx, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hq, Wq, _F), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, wh, ww, 128), jnp.bfloat16),
            pltpu.VMEM((2, wh, ww, 128), jnp.bfloat16),
            pltpu.VMEM((PB, _F + 4 * _G), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xw, condp, *ks, bias, sftm, sftb)


def _conv(p, a, bf16=jnp.bfloat16):
    return jax.lax.conv_general_dilated(
        a, jnp.asarray(p["kernel"], bf16), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(bf16) \
        + jnp.asarray(p["bias"], bf16)


def _sft_xla(sp, x3, cond3):
    """SFTLayer on [H,W,C] values (1x1 convs as channel matmuls, bf16)."""
    def m1(pp, a):
        return (a @ jnp.asarray(pp["kernel"], jnp.bfloat16)[0, 0]
                + jnp.asarray(pp["bias"], jnp.bfloat16))
    scale = m1(sp["scale1"], _lrelu(m1(sp["scale0"], cond3)))
    shift = m1(sp["shift1"], _lrelu(m1(sp["shift0"], cond3)))
    return x3 * (scale + 1.0) + shift


def sftnet_apply_pallas(params, x, cond, *, scale: int = 4,
                        num_block: int = 5, th: int = 48, tw: int = 128,
                        interpret: bool = False):
    """Full SFTNet eval forward with the fused Pallas body.

    Mirrors ``SFTNet.__call__`` (models/sr_esrnet.py) / the reference graph
    (lib/sr_esrnet.py:446-465): conv_first -> CondNet -> num_block x
    RRDB_SFT -> sftbody/conv_body residual -> x4 upsample chain. Head/tail
    convs run as XLA bf16 convs; the 15 dense blocks run fused.

    x: [1, H, W, Cin] (any float dtype); cond: [1, H, W, num_cond].
    Returns f32 [1, scale*H, scale*W, 3].
    """
    m = _HALO
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
    body = jnp.pad(feat[0], ((0, Hq - H), (0, Wq - W), (0, 0)))
    cond_core = jnp.pad(c[0], ((0, Hq - H), (0, Wq - W), (0, 0)))
    condp = jnp.pad(cond_core, ((m, m), (m, m), (0, 128 - _G)))

    for i in range(num_block):
        bp = params[f"body{i}"]
        xin = body
        cur = body
        for j in (1, 2, 3):
            cur = rdb_apply_pallas(cur, condp, pack_rdb_weights(bp[f"rdb{j}"]),
                                   H=H, W=W, th=th, tw=tw,
                                   interpret=interpret)
        body = _sft_xla(bp["sft0"], cur, cond_core) * bf(0.2) + xin

    body = _sft_xla(params["sftbody"], body, cond_core)
    body = _conv(params["conv_body"], body[:H, :W][None]) + feat

    def up2(a):
        return jnp.repeat(jnp.repeat(a, 2, axis=1), 2, axis=2)

    if scale > 1:
        body = _lrelu(_conv(params["conv_up1"], up2(body)))
        if scale == 4:
            body = _lrelu(_conv(params["conv_up2"], up2(body)))
    out = _lrelu(_conv(params["conv_hr"], body))
    return _conv(params["conv_last"], out).astype(jnp.float32)

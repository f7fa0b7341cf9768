"""Space-to-depth conv reformulation for the SFTNet 4K decode.

The VC-Decoder's convs are 32-64 channels wide (reference
/root/reference/lib/sr_esrnet.py:59-182); on TPU such convs underfill the
128-lane MXU (measured 22.6 TF/s definitional for 3x3@64ch at fern scale
vs 90+ TF/s for the same work expressed at 256ch). Two EXACT
transformations fix the shapes:

1. **s2d(2) body**: a stride-1 3x3 conv C->D on [H,W] equals a 3x3 conv
   4C->4D on the space-to-depth tensor [H/2,W/2,4C], with the transformed
   kernel ``K'[dy,dx,(p,c),(q,d)] = K[a,b,c,d]`` where ``a = 2*dy+py-qy``
   (zero when |a|>1). 4x the definitional FLOPs as structural zeros, but
   >2x net faster from MXU utilization. Built with one einsum against a
   constant selection tensor.

2. **Phase-decomposed upsample**: ``conv3x3(nearest_up2(x))`` equals four
   2x2 convs on x (one per output phase, kernels = summed taps), pixel-
   shuffled -- 2.25x fewer FLOPs AND skips materializing the upsampled
   tensor in HBM.

Both are weight-space rewrites: parameter trees and checkpoints are
untouched; numerics match to bf16 rounding (f32 accumulation either way).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _sel() -> np.ndarray:
    """S[dy, p, q, a1] = 1 iff original tap a = a1-1 satisfies
    a == 2*(dy-1) + p - q and |a| <= 1."""
    S = np.zeros((3, 2, 2, 3), np.float32)
    for dyi in range(3):
        for p in range(2):
            for q in range(2):
                a = 2 * (dyi - 1) + p - q
                if -1 <= a <= 1:
                    S[dyi, p, q, a + 1] = 1.0
    return S


_S = _sel()

# U[q, di, a1] = 1 iff floor((q + a)/2) == di - (1 - q)  (phase-conv taps)
_U = np.zeros((2, 2, 3), np.float32)
for _q in range(2):
    for _a in (-1, 0, 1):
        _dy = (_q + _a) // 2 if (_q + _a) >= 0 else -1
        _di = _dy + (1 - _q)
        if 0 <= _di <= 1:
            _U[_q, _di, _a + 1] = 1.0


def s2d(x):
    """[N,H,W,C] -> [N,H/2,W/2,4C], channel order (py,px,c)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


def d2s(x):
    """Inverse of :func:`s2d`."""
    n, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(n, h, w, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, 2 * h, 2 * w, c)


def s2d_kernel(K):
    """Transform a 3x3 conv kernel [3,3,C,D] -> [3,3,4C,4D] (see module
    docstring); exact, 25% fill."""
    S = jnp.asarray(_S, K.dtype)
    Kp = jnp.einsum("YPQA,XUVB,ABcd->YXPUcQVd", S, S, K)
    C, D = K.shape[2], K.shape[3]
    return Kp.reshape(3, 3, 4 * C, 4 * D)


def up_phase_kernels(K):
    """conv3x3-after-nearest-up2 as four 2x2 phase kernels.

    Returns [2,2,2,2,C,D]: ``out[2i+qy, 2j+qx] = conv2x2(x, K_[qy,qx])``
    with per-phase padding (top,left) = (1-qy, 1-qx).
    """
    U = jnp.asarray(_U, K.dtype)
    return jnp.einsum("QDA,RWB,ABcd->QRDWcd", U, U, K)


def conv_up_phase(x, K, b):
    """Fused nearest_up2 + 3x3 conv: [N,H,W,C] -> [N,2H,2W,D] (f32 accum,
    cast back to x.dtype; bias added per phase)."""
    Kq = up_phase_kernels(K)
    outs = []
    for qy in range(2):
        row = []
        for qx in range(2):
            y = jax.lax.conv_general_dilated(
                x, Kq[qy, qx], (1, 1),
                [(1 - qy, qy), (1 - qx, qx)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            row.append(y + b.astype(jnp.float32))
        outs.append(row)
    n, h, w, d = outs[0][0].shape
    y = jnp.stack([jnp.stack(r, 3) for r in outs], 3)  # [N,H,W,2,2,D]
    return y.reshape(n, h, w, 2, 2, d).transpose(0, 1, 3, 2, 4, 5) \
        .reshape(n, 2 * h, 2 * w, d).astype(x.dtype)


def up_dilated_kernel(K):
    """conv3x3-after-nearest-up2 as ONE 4x4 kernel on the zero-dilated
    input (``lhs_dilation=2``): nearest-up2 = zero-up2 followed by a 2x2
    ones smear, and conv(K, smear(z)) = conv(K (*) ones2x2, z).  Per axis
    the fused taps sit at offsets u in {-2..1} with
    ``K'[u+2] = sum_{e in {0,1}} K[u+e+1]`` (terms with index outside 0..2
    dropped).  Returns [4,4,C,D]."""
    # A[iu, a] = 1 iff original tap a (0..2) contributes to fused tap iu
    A = np.zeros((4, 3), np.float32)
    for iu in range(4):
        for e in range(2):
            a = iu - 2 + e + 1
            if 0 <= a <= 2:
                A[iu, a] = 1.0
    A = jnp.asarray(A, K.dtype)
    return jnp.einsum("UA,VB,ABcd->UVcd", A, A, K)


def conv_up_dilated(x, K, b):
    """Fused nearest_up2 + 3x3 conv via one ``lhs_dilation=2`` conv:
    [N,H,W,C] -> [N,2H,2W,D] without materializing the upsampled tensor.
    Exact same math as ``conv3x3(nearest_up2(x))`` (weight-space rewrite;
    f32 accumulation)."""
    K4 = up_dilated_kernel(K)
    y = jax.lax.conv_general_dilated(
        x, K4, (1, 1), [(2, 2), (2, 2)], lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return (y + b.astype(jnp.float32)).astype(x.dtype)


def block_diag_1x1(K):
    """1x1 conv kernel [Ci,Co] -> s2d-domain [4Ci,4Co] (phases independent)."""
    Ci, Co = K.shape
    Z = jnp.zeros_like(K)
    rows = []
    for p in range(4):
        rows.append(jnp.concatenate([K if q == p else Z for q in range(4)], 1))
    return jnp.concatenate(rows, 0)


def _conv_s2d(x, Kp, *, pet=jnp.float32):
    return jax.lax.conv_general_dilated(
        x, Kp, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pet)


def _lrelu(x):
    return jnp.where(x >= 0, x, 0.2 * x)


def _tile4(b):
    return jnp.tile(b, 4)


def _apply_mask(y, mask4):
    """Zero out-of-frame pixels of an s2d activation. ``mask4`` is the
    4-channel per-phase frame mask [1,Hs,Ws,4]; activations are laid out
    phase-major with channel blocks of width C = y.shape[-1]//4, so the
    mask must be repeated per activation width (NOT built once at a fixed
    width and sliced -- that misassigns phases for narrower activations)."""
    return y * jnp.repeat(mask4, y.shape[-1] // 4, axis=-1)


def _sft_s2d(sp, x, cond, bf, mask=None):
    """SFTLayer in the s2d domain: 1x1 convs become block-diagonal.
    ``mask`` ([1,Hs,Ws,4] per-phase) zeroes out-of-frame phase channels
    (odd frame dims only) so every conv layer sees exact zero padding at
    the true boundary."""
    def m1(pp, a):
        return (a @ block_diag_1x1(jnp.asarray(pp["kernel"], bf)[0, 0])
                + _tile4(jnp.asarray(pp["bias"], bf)))
    scale = m1(sp["scale1"], _lrelu(m1(sp["scale0"], cond)))
    shift = m1(sp["shift1"], _lrelu(m1(sp["shift0"], cond)))
    y = x * (scale + 1.0) + shift
    return y if mask is None else _apply_mask(y, mask)


def _rdb_s2d(bp, x, cond, bf, mask=None, wide_dtype=jnp.float32):
    """ResidualDenseBlockSFT in the s2d domain: source-grouped walk with
    s2d-transformed kernel slices (models/sr_esrnet.py:84-129).

    ``wide_dtype=bfloat16`` rounds the per-source partial conv outputs
    before the cross-source adds (the adds still accumulate in f32): the
    wide tensors are what the walk round-trips through HBM, so this halves
    the decode's bandwidth bill; the extra error is quantified in
    tests/test_s2d.py."""
    F, G = 64, 32
    ks = [jnp.asarray(bp[f"conv{i+1}"]["kernel"], bf) for i in range(5)]
    bs = [jnp.asarray(bp[f"conv{i+1}"]["bias"], jnp.float32) for i in range(5)]
    splits = [F, G, G, G, G]
    cum = np.cumsum([0] + splits)
    n = 5
    acc = [None] * n

    xc0 = _sft_s2d(bp["sft0"], x, cond, bf, mask)
    src = xc0
    for j in range(n):
        # per-(source, target) s2d transforms concatenated on the out axis:
        # output layout stays target-major, each target block (q,d)-ordered,
        # matching the (p,c) source layout the next conv consumes
        kj = jnp.concatenate(
            [s2d_kernel(ks[t][:, :, cum[j]:cum[j + 1], :]) for t in range(j, n)],
            axis=-1)
        wide = _conv_s2d(src, kj, pet=wide_dtype)
        off = 0
        for t in range(j, n):
            cout = 4 * ks[t].shape[-1]
            w32 = wide[..., off:off + cout].astype(jnp.float32)
            acc[t] = w32 if acc[t] is None else acc[t] + w32
            off += cout
        if j < n - 1:
            y = _lrelu(acc[j] + _tile4(bs[j])).astype(bf)
            if mask is not None:
                y = _apply_mask(y, mask)
            src = _sft_s2d(bp["sft1"], y, cond, bf, mask) if j == 3 else y
    x5 = (acc[n - 1] + _tile4(bs[n - 1])).astype(bf)
    return x5 * bf(0.2) + x


def sftnet_apply_s2d(params, x, cond, *, scale: int = 4, num_block: int = 5,
                     wide_dtype=jnp.float32):
    """Full SFTNet eval forward with the s2d body + phase-up chain.

    Mirrors ``SFTNet.__call__`` (models/sr_esrnet.py:163-183) exactly in
    weight space; bf16 activations, f32 conv accumulation. Returns f32.
    """
    bf = jnp.bfloat16
    H, W = x.shape[1], x.shape[2]
    ph, pw = H % 2, W % 2  # s2d needs even dims; pad and crop at the end
    x16 = jnp.pad(x.astype(bf), ((0, 0), (0, ph), (0, pw), (0, 0)))
    c16 = jnp.pad(cond.astype(bf), ((0, 0), (0, ph), (0, pw), (0, 0)))

    def conv(p, a):
        return (_conv_s2d(a, jnp.asarray(p["kernel"], bf)).astype(bf)
                + jnp.asarray(p["bias"], bf))

    feat = conv(params["conv_first"], x16)
    c = conv(params["cond0"], c16)
    for nm in ("cond1", "cond2", "cond3"):
        c = (_lrelu(c) @ jnp.asarray(params[nm]["kernel"], bf)[0, 0]
             + jnp.asarray(params[nm]["bias"], bf))

    # frame mask (odd dims only): 1 on true-frame pixels per s2d phase,
    # kept at 4 channels and repeated to each activation's width at every
    # application site (see _apply_mask; a fixed-width sliced mask would
    # misassign phases for activations narrower than it)
    mask = None
    if ph or pw:
        ones = jnp.pad(jnp.ones((1, H, W, 1), bf), ((0, 0), (0, ph), (0, pw), (0, 0)))
        mask = s2d(ones)  # [1,Hs,Ws,4] per-phase

    body = s2d(feat)
    cs = s2d(c)
    if mask is not None:
        body = _apply_mask(body, mask)
    for i in range(num_block):
        bp = params[f"body{i}"]
        xin = body
        cur = body
        for j in (1, 2, 3):
            cur = _rdb_s2d(bp[f"rdb{j}"], cur, cs, bf, mask,
                           wide_dtype=wide_dtype)
        body = _sft_s2d(bp["sft0"], cur, cs, bf, mask) * bf(0.2) + xin

    body = _sft_s2d(params["sftbody"], body, cs, bf, mask)
    body = (_conv_s2d(body, s2d_kernel(
        jnp.asarray(params["conv_body"]["kernel"], bf))).astype(bf)
        + _tile4(jnp.asarray(params["conv_body"]["bias"], bf)))
    # exact dims from here on: the upchain then needs no masking
    body = d2s(body)[:, :H, :W] + feat[:, :H, :W]

    if scale > 1:
        body = _lrelu(conv_up_phase(
            body, jnp.asarray(params["conv_up1"]["kernel"], bf),
            jnp.asarray(params["conv_up1"]["bias"], bf)))
        if scale == 4:
            body = _lrelu(conv_up_phase(
                body, jnp.asarray(params["conv_up2"]["kernel"], bf),
                jnp.asarray(params["conv_up2"]["bias"], bf)))
    out = _lrelu(conv(params["conv_hr"], body))
    out = (_conv_s2d(out, jnp.asarray(params["conv_last"]["kernel"], bf))
           + jnp.asarray(params["conv_last"]["bias"], jnp.float32))
    return out.astype(jnp.float32)

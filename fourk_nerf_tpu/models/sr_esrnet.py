"""VC-Decoder: SFT-conditioned RRDB super-resolution generator (Flax).

TPU-native rebuild of the reference SFTNet (/root/reference/lib/sr_esrnet.py:400-465):
``conv_first`` -> 5x RRDB_SFT (each 3x ResidualDenseBlock_SFT + SFT) ->
sftbody + conv_body residual -> 2x nearest-upsample convs (x4) ->
conv_hr/conv_last, with a CondNet mapping the conditioning signal
(depth / viewdir-PE / both) to the 32-channel SFT condition.

Data layout is NHWC (TPU-native); the torch-checkpoint import shim transposes
the reference's NCHW/OIHW tensors (see :func:`import_realesrnet_torch`).

Tiled 4K inference (the reference's ``tile_process``, lib/sr_esrnet.py:467-527)
is expressed as a batched scan over same-shape padded tiles --
:func:`tile_process` -- which XLA pipelines instead of a Python loop of
kernel launches.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _lrelu(x):
    return nn.leaky_relu(x, negative_slope=0.2)


class SFTLayer(nn.Module):
    """x * (scale+1) + shift, scale/shift from two 1x1-conv branches
    (reference lib/sr_esrnet.py:112-123)."""

    num_feat: int = 64
    num_grow_ch: int = 32

    @nn.compact
    def __call__(self, x, cond):
        scale = nn.Conv(self.num_grow_ch, (1, 1), name="scale0")(cond)
        scale = nn.Conv(self.num_feat, (1, 1), name="scale1")(_lrelu(scale))
        shift = nn.Conv(self.num_grow_ch, (1, 1), name="shift0")(cond)
        shift = nn.Conv(self.num_feat, (1, 1), name="shift1")(_lrelu(shift))
        return x * (scale + 1.0) + shift


def _rdb_kernel_init(key, shape, dtype=jnp.float32):
    # the reference scales kaiming-normal init by 0.1 for dense-block convs
    # (lib/sr_esrnet.py:78); kaiming_normal over fan_in with relu gain
    fan_in = shape[0] * shape[1] * shape[2]
    std = math.sqrt(2.0 / fan_in)
    return 0.1 * std * jax.random.normal(key, shape, dtype)


def _rdb_conv(features, name):
    return nn.Conv(features, (3, 3), kernel_init=_rdb_kernel_init, name=name)


class _ConvP(nn.Module):
    """Parameter container matching nn.Conv's tree ({kernel, bias}) for the
    dense-block convs whose kernels are re-grouped at apply time."""

    cin: int
    cout: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", _rdb_kernel_init, (3, 3, self.cin, self.cout))
        b = self.param("bias", nn.initializers.zeros, (self.cout,))
        return k, b


def _conv3(x, kernel):
    # f32 accumulation regardless of the compute dtype: the fused dense
    # block sums up to 5 partial convs, which must not round between adds
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


class ResidualDenseBlockSFT(nn.Module):
    """Dense block with SFT conditioning at entry and before the fuse conv
    (reference lib/sr_esrnet.py:126-158). Evaluated source-grouped (see
    :func:`_dense_block_fused`); the parameter tree is identical to the
    per-conv formulation, so torch-checkpoint import is unchanged."""

    num_feat: int = 64
    num_grow_ch: int = 32

    @nn.compact
    def __call__(self, x, cond):
        F, G = self.num_feat, self.num_grow_ch
        xc0 = SFTLayer(F, G, name="sft0")(x, cond)
        ks, bs = zip(*[
            _ConvP(F + i * G, G if i < 4 else F, name=f"conv{i+1}")()
            for i in range(5)])
        splits = [F, G, G, G, G]

        # sources: conv5 consumes xc1 = sft1(x4) instead of x4, so the
        # fused walk substitutes it as source 4 (index into x0_list)
        n = len(ks)
        cum = np.cumsum([0] + splits)
        acc = [None] * n

        def add(a, v):
            return v if a is None else a + v

        src = xc0
        for j in range(n):
            kj = jnp.concatenate(
                [ks[t][:, :, cum[j]:cum[j + 1], :] for t in range(j, n)],
                axis=-1)
            wide = _conv3(src, kj)  # f32
            off = 0
            for t in range(j, n):
                cout = ks[t].shape[-1]
                acc[t] = add(acc[t], wide[..., off:off + cout])
                off += cout
            if j < n - 1:
                y = _lrelu(acc[j] + bs[j].astype(jnp.float32)).astype(x.dtype)
                if j == 3:  # x4 -> sft1 -> conv5's last source
                    src = SFTLayer(G, G, name="sft1")(y, cond)
                else:
                    src = y
        x5 = (acc[n - 1] + bs[n - 1].astype(jnp.float32)).astype(x.dtype)
        return x5 * 0.2 + x


class RRDBSFT(nn.Module):
    """Residual-in-residual: 3 dense blocks + trailing SFT
    (reference lib/sr_esrnet.py:161-182)."""

    num_feat: int = 64
    num_grow_ch: int = 32

    @nn.compact
    def __call__(self, x, cond):
        out = ResidualDenseBlockSFT(self.num_feat, self.num_grow_ch, name="rdb1")(x, cond)
        out = ResidualDenseBlockSFT(self.num_feat, self.num_grow_ch, name="rdb2")(out, cond)
        out = ResidualDenseBlockSFT(self.num_feat, self.num_grow_ch, name="rdb3")(out, cond)
        out = SFTLayer(self.num_feat, self.num_grow_ch, name="sft0")(out, cond)
        return out * 0.2 + x


def _nearest_up2(x):
    n, h, w, c = x.shape
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class SFTNet(nn.Module):
    """The VC-Decoder. Input NHWC (LR feature/rgb patch) + cond NHWC."""

    n_in_colors: int = 3
    scale: int = 4
    num_feat: int = 64
    num_block: int = 5
    num_grow_ch: int = 32
    num_cond: int = 1

    @nn.compact
    def __call__(self, x, cond):
        feat = nn.Conv(self.num_feat, (3, 3), name="conv_first")(x)
        c = nn.Conv(64, (3, 3), name="cond0")(cond)
        c = nn.Conv(64, (1, 1), name="cond1")(_lrelu(c))
        c = nn.Conv(64, (1, 1), name="cond2")(_lrelu(c))
        c = nn.Conv(32, (1, 1), name="cond3")(_lrelu(c))

        body = feat
        for i in range(self.num_block):
            body = RRDBSFT(self.num_feat, self.num_grow_ch, name=f"body{i}")(body, c)
        body = SFTLayer(self.num_feat, self.num_grow_ch, name="sftbody")(body, c)
        body = nn.Conv(self.num_feat, (3, 3), name="conv_body")(body)
        body = body + feat

        if self.scale > 1:
            body = _lrelu(nn.Conv(self.num_feat, (3, 3), name="conv_up1")(_nearest_up2(body)))
            if self.scale == 4:
                body = _lrelu(nn.Conv(self.num_feat, (3, 3), name="conv_up2")(_nearest_up2(body)))
        out = _lrelu(nn.Conv(self.num_feat, (3, 3), name="conv_hr")(body))
        return nn.Conv(3, (3, 3), name="conv_last")(out)


class ResidualDenseBlock(nn.Module):
    """Plain (non-SFT) ESRGAN dense block (reference lib/sr_esrnet.py:59-87)."""

    num_feat: int = 64
    num_grow_ch: int = 32

    @nn.compact
    def __call__(self, x):
        # source-grouped evaluation (see ResidualDenseBlockSFT): one wide
        # conv per source instead of five 32-out convs + big concats
        F, G = self.num_feat, self.num_grow_ch
        ks, bs = zip(*[
            _ConvP(F + i * G, G if i < 4 else F, name=f"conv{i+1}")()
            for i in range(5)])
        splits = [F, G, G, G, G]
        n = len(ks)
        cum = np.cumsum([0] + splits)
        acc = [None] * n

        def add(a, v):
            return v if a is None else a + v

        src = x
        for j in range(n):
            kj = jnp.concatenate(
                [ks[t][:, :, cum[j]:cum[j + 1], :] for t in range(j, n)],
                axis=-1)
            wide = _conv3(src, kj)  # f32
            off = 0
            for t in range(j, n):
                cout = ks[t].shape[-1]
                acc[t] = add(acc[t], wide[..., off:off + cout])
                off += cout
            if j < n - 1:
                src = _lrelu(acc[j] + bs[j].astype(jnp.float32)).astype(x.dtype)
        x5 = (acc[n - 1] + bs[n - 1].astype(jnp.float32)).astype(x.dtype)
        return x5 * 0.2 + x


class RRDB(nn.Module):
    """(reference lib/sr_esrnet.py:90-109)"""

    num_feat: int = 64
    num_grow_ch: int = 32

    @nn.compact
    def __call__(self, x):
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch, name="rdb1")(x)
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch, name="rdb2")(out)
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch, name="rdb3")(out)
        return out * 0.2 + x


def _pixel_shuffle2(x):
    """NHWC pixel shuffle x2 with torch channel ordering (in-channel index
    c*4 + a*2 + b -> out[c] at offset (a, b)): [N,H,W,4C] -> [N,2H,2W,C]."""
    n, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(n, h, w, c, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(n, h * 2, w * 2, c)


class RRDBNetBPS(nn.Module):
    """Plain RRDB super-resolver with pixel-shuffle upsampling
    (reference RRDBNet_bps, lib/sr_esrnet.py:185-241)."""

    n_colors: int = 3
    scale: int = 4
    num_feat: int = 64
    num_block: int = 5
    num_grow_ch: int = 32

    @nn.compact
    def __call__(self, x):
        feat = nn.Conv(self.num_feat, (3, 3), name="conv_first")(x)
        body = feat
        for i in range(self.num_block):
            body = RRDB(self.num_feat, self.num_grow_ch, name=f"body{i}")(body)
        feat = feat + nn.Conv(self.num_feat, (3, 3), name="conv_body")(body)
        up = _pixel_shuffle2(nn.Conv(4 * self.num_feat, (3, 3), name="ps_preconv1")(feat))
        feat = _lrelu(nn.Conv(self.num_feat, (3, 3), name="conv_up1")(up))
        if self.scale == 4:
            up = _pixel_shuffle2(nn.Conv(4 * self.num_feat, (3, 3), name="ps_preconv2")(feat))
            feat = _lrelu(nn.Conv(self.num_feat, (3, 3), name="conv_up2")(up))
        out = _lrelu(nn.Conv(self.num_feat, (3, 3), name="conv_hr")(feat))
        return nn.Conv(self.n_colors, (3, 3), name="conv_last")(out)


# ---------------------------------------------------------------------------
# Tiled 4K inference
# ---------------------------------------------------------------------------

def tile_process(apply_fn, params, img, cond, tile_size: int, tile_pad: int = 10,
                 scale: int = 4):
    """Memory-bounded full-frame SR: pad the frame, cut overlapping same-shape
    tiles, batch them through one compiled forward, paste the unpadded cores.

    Functionally equivalent to the reference's per-tile Python loop
    (lib/sr_esrnet.py:467-527) but static-shaped: every tile (edge tiles
    included) is ``tile_size + 2*tile_pad`` square, so one XLA program serves
    all tiles and the scan pipelines them.

    Args:
      apply_fn: ``(params, x_tile, cond_tile) -> sr_tile`` (NHWC).
      img: ``[1, H, W, C]``; cond: ``[1, H, W, Cc]``.
    """
    _, H, W, C = img.shape
    ts, tp = tile_size, tile_pad
    ny, nx = math.ceil(H / ts), math.ceil(W / ts)
    padded_h, padded_w = ny * ts + 2 * tp, nx * ts + 2 * tp
    img_p = jnp.pad(img, ((0, 0), (tp, padded_h - H - tp), (tp, padded_w - W - tp), (0, 0)),
                    mode="edge")
    cond_p = jnp.pad(cond, ((0, 0), (tp, padded_h - H - tp), (tp, padded_w - W - tp), (0, 0)),
                     mode="edge")

    starts = [(y * ts, x * ts) for y in range(ny) for x in range(nx)]
    tiles = jnp.stack([
        jax.lax.dynamic_slice(img_p[0], (sy, sx, 0), (ts + 2 * tp, ts + 2 * tp, C))
        for sy, sx in starts
    ])
    cond_tiles = jnp.stack([
        jax.lax.dynamic_slice(cond_p[0], (sy, sx, 0), (ts + 2 * tp, ts + 2 * tp, cond.shape[-1]))
        for sy, sx in starts
    ])

    def one(carry, inp):
        t, ct = inp
        sr = apply_fn(params, t[None], ct[None])[0]
        core = sr[tp * scale:(tp + ts) * scale, tp * scale:(tp + ts) * scale]
        return carry, core

    _, cores = jax.lax.scan(one, None, (tiles, cond_tiles))
    # paste cores ON DEVICE: tiles are row-major [ny*nx, hs, hs, 3] -> frame
    hs = ts * scale
    out = (cores.reshape(ny, nx, hs, hs, 3).transpose(0, 2, 1, 3, 4)
           .reshape(ny * hs, nx * hs, 3)[: H * scale, : W * scale])
    return out[None]


def tile_process_sharded(apply_fn, params, img, cond, tile_size: int,
                         mesh, tile_pad: int = 10, scale: int = 4,
                         axis: str = "data"):
    """Multi-chip :func:`tile_process`: the tile batch is data-parallel over
    ``mesh``'s ``axis`` (SURVEY.md section 2.3's 4K tile-scaling plan;
    reference single-GPU loop lib/sr_esrnet.py:467-527).  Tiles are
    independent -- the overlap halo is baked into each padded tile, so the
    only collective is the output all-gather XLA inserts for the paste.
    Exactly equal to the single-device path (tests/test_parallel.py)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map  # jax>=0.4.35 top-level API

    _, H, W, C = img.shape
    ts, tp = tile_size, tile_pad
    ny, nx = math.ceil(H / ts), math.ceil(W / ts)
    padded_h, padded_w = ny * ts + 2 * tp, nx * ts + 2 * tp
    img_p = jnp.pad(img, ((0, 0), (tp, padded_h - H - tp),
                          (tp, padded_w - W - tp), (0, 0)), mode="edge")
    cond_p = jnp.pad(cond, ((0, 0), (tp, padded_h - H - tp),
                            (tp, padded_w - W - tp), (0, 0)), mode="edge")
    starts = [(y * ts, x * ts) for y in range(ny) for x in range(nx)]
    cut = lambda src, c: jnp.stack([
        jax.lax.dynamic_slice(src[0], (sy, sx, 0),
                              (ts + 2 * tp, ts + 2 * tp, c))
        for sy, sx in starts])
    tiles = cut(img_p, C)
    cond_tiles = cut(cond_p, cond.shape[-1])

    D = mesh.shape[axis]
    nt = len(starts)
    padn = (-nt) % D
    if padn:  # round the tile count up to the axis size (extras discarded)
        tiles = jnp.concatenate([tiles, tiles[:padn]])
        cond_tiles = jnp.concatenate([cond_tiles, cond_tiles[:padn]])

    def shard_fwd(t, ct):
        def one(carry, inp):
            tt, c2 = inp
            sr = apply_fn(params, tt[None], c2[None])[0]
            core = sr[tp * scale:(tp + ts) * scale,
                      tp * scale:(tp + ts) * scale]
            return carry, core

        _, cores = jax.lax.scan(one, None, (t, ct))
        return cores

    sharded = NamedSharding(mesh, P(axis))
    with mesh:
        cores = shard_map(
            shard_fwd, mesh=mesh, in_specs=(P(axis), P(axis)),
            out_specs=P(axis), check_vma=False,
        )(jax.device_put(tiles, sharded), jax.device_put(cond_tiles, sharded))
    cores = cores[:nt]
    hs = ts * scale
    out = (cores.reshape(ny, nx, hs, hs, 3).transpose(0, 2, 1, 3, 4)
           .reshape(ny * hs, nx * hs, 3)[: H * scale, : W * scale])
    return out[None]


def apply_bf16(sr_model, params, x, cond):
    """bf16 SR inference: casts params + activations to bfloat16 for ~2x MXU
    conv throughput; returns f32. Accuracy vs the f32 path is quantified in
    tests/test_sr.py (sub-1e-2 absolute on [0,1] images)."""
    p16 = jax.tree.map(lambda v: v.astype(jnp.bfloat16), params)
    y = sr_model.apply({"params": p16}, x.astype(jnp.bfloat16),
                       cond.astype(jnp.bfloat16))
    return y.astype(jnp.float32)


def enhance(apply_fn, params, img, cond=None, *, scale: int = 4, pre_pad: int = 10,
            mod: int = 8, tile_size: int = 0, tile_pad: int = 10):
    """Standalone SR inference with pre-padding and modulus padding.

    Equivalent of the reference's ``RealESRGANer.enhance`` helper
    (/root/reference/lib/utils.py:152-345): reflect-pad by ``pre_pad``, pad to a
    multiple of ``mod``, run the network (tiled when ``tile_size`` > 0), then
    crop both pads from the upscaled output.

    Args:
      apply_fn: ``(params, x, cond) -> y`` NHWC (pass-through cond if None).
      img: ``[1, H, W, C]`` in [0, 1].
    """
    _, H, W, C = img.shape
    fn = apply_fn if cond is not None else (lambda p, x, c: apply_fn(p, x))
    x = jnp.pad(img, ((0, 0), (pre_pad, pre_pad), (pre_pad, pre_pad), (0, 0)),
                mode="reflect")
    c = (
        jnp.pad(cond, ((0, 0), (pre_pad, pre_pad), (pre_pad, pre_pad), (0, 0)),
                mode="reflect") if cond is not None else None
    )
    h, w = x.shape[1:3]
    mh, mw = (-h) % mod, (-w) % mod
    x = jnp.pad(x, ((0, 0), (0, mh), (0, mw), (0, 0)), mode="reflect")
    if c is not None:
        c = jnp.pad(c, ((0, 0), (0, mh), (0, mw), (0, 0)), mode="reflect")
    else:
        c = jnp.zeros_like(x[..., :1])
    if tile_size > 0:
        y = tile_process(fn, params, x, c, tile_size=tile_size, tile_pad=tile_pad,
                         scale=scale)
    else:
        y = np.asarray(fn(params, x, c))
    y = y[:, : (h * scale), : (w * scale)]  # remove mod pad
    p = pre_pad * scale
    return y[:, p:p + H * scale, p:p + W * scale]


# ---------------------------------------------------------------------------
# Torch checkpoint import: RealESRNet_x4plus.pth init / reference .pth saves
# ---------------------------------------------------------------------------

def _t2j_conv(w):
    """torch OIHW -> flax HWIO."""
    return np.transpose(np.asarray(w, dtype=np.float32), (2, 3, 1, 0))


_SFT_MAP = {"SFT_scale_conv0": "scale0", "SFT_scale_conv1": "scale1",
            "SFT_shift_conv0": "shift0", "SFT_shift_conv1": "shift1"}


def import_sftnet_torch(state_dict, num_block: int = 5) -> dict:
    """Map a reference SFTNet torch state dict to our Flax param tree.

    Handles both the full SFTNet save and the plain RealESRNet RRDBNet init
    (whose ``body.N.rdbM.convK`` keys exist but SFT/CondNet keys do not --
    missing keys are simply absent, mirroring the reference's
    ``strict=False`` load, lib/sr_esrnet.py:529-554).
    """
    import torch  # noqa: F401  (state_dict tensors may be torch tensors)

    def np_(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    params: dict = {}

    def put(path, kernel, bias):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(bias)}

    condnet_idx = {0: "cond0", 2: "cond1", 4: "cond2", 6: "cond3"}
    for k in list(state_dict.keys()):
        if not k.endswith(".weight"):
            continue
        base = k[: -len(".weight")]
        w = _t2j_conv(np_(state_dict[k]))
        b = np_(state_dict.get(base + ".bias", np.zeros(w.shape[-1], np.float32)))
        parts = base.split(".")
        if parts[0] in ("conv_first", "conv_body", "conv_up1", "conv_up2", "conv_hr", "conv_last"):
            put((parts[0],), w, b)
        elif parts[0] == "CondNet":
            put((condnet_idx[int(parts[1])],), w, b)
        elif parts[0] == "sftbody":
            put(("sftbody", _SFT_MAP[parts[1]]), w, b)
        elif parts[0] == "body":
            blk = f"body{parts[1]}"
            if parts[2].startswith("rdb"):
                if parts[3].startswith("conv"):
                    put((blk, parts[2], parts[3]), w, b)
                else:  # sft0/sft1 inside the dense block
                    put((blk, parts[2], parts[3], _SFT_MAP[parts[4]]), w, b)
            elif parts[2] == "sft0":
                put((blk, "sft0", _SFT_MAP[parts[3]]), w, b)
    return params


def merge_params(init_params: dict, imported: dict) -> dict:
    """Overlay imported params onto a freshly-initialized tree (strict=False
    semantics: missing/mismatched keys keep their init values)."""
    out = {}
    for k, v in init_params.items():
        if k in imported:
            if isinstance(v, dict) and isinstance(imported[k], dict) and "kernel" not in v:
                out[k] = merge_params(v, imported[k])
            else:
                iv = imported[k]
                if isinstance(v, dict) and isinstance(iv, dict):
                    ok = all(
                        kk in iv and iv[kk].shape == v[kk].shape for kk in v
                    )
                    out[k] = {kk: jnp.asarray(iv[kk]) for kk in v} if ok else v
                else:
                    out[k] = jnp.asarray(iv) if getattr(iv, "shape", None) == getattr(v, "shape", None) else v
        else:
            out[k] = v
    return out

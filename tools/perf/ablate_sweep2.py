#!/usr/bin/env python3
"""Round-2 XLA-level sweep restructures, timed on device.

Variants:
- repeat: second contraction as lane-friendly multiply+strided-reduce
  (wy repeated along lanes; keeps the last dim at P*Cp=768 instead of
  reducing over a Cp=16-lane middle axis)
- repeat_bf16: + bf16 packed grid
- all: repeat + bf16 + fold MLP layer0 over feat channels into the
  plane patch? (NO -- just repeat+bf16+f32 accum check)

Run: PYTHONPATH=/root/repo python tools/perf/ablate_sweep2.py
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from fourk_nerf_tpu.models import common
from fourk_nerf_tpu.ops import render, rays as ray_ops
from ablate_sweep import build_inputs


def sweep2(packed, act_shift, a_tiles, b_tiles, vd_tiles, mlp_params, *,
           cfg, interval, patch: int, k0_dim: int, bg: float, act,
           mode: str):
    Z, X, Y, Cp = packed.shape
    T, R, _ = a_tiles.shape
    mm_dtype = jnp.bfloat16
    mlp_mm = jax.tree.map(lambda x: x.astype(mm_dtype), mlp_params)
    viewdir_emb = ray_ops.positional_encoding(vd_tiles, cfg.viewbase_pe)

    def body(carry, inp):
        t_cum, rgb_acc, depth_acc, alive = carry
        plane, shift_k, k = inp
        pos = a_tiles + b_tiles * k
        ox = jnp.clip(jnp.floor(jnp.min(pos[..., 0], axis=1)).astype(jnp.int32) - 1,
                      0, X - patch)
        oy = jnp.clip(jnp.floor(jnp.min(pos[..., 1], axis=1)).astype(jnp.int32) - 1,
                      0, Y - patch)
        patches = jax.vmap(
            lambda x0, y0: jax.lax.dynamic_slice(plane, (x0, y0, 0),
                                                 (patch, patch, Cp))
        )(ox, oy)
        rel_x = pos[..., 0] - ox[:, None].astype(pos.dtype)
        rel_y = pos[..., 1] - oy[:, None].astype(pos.dtype)
        taps = jnp.arange(patch, dtype=pos.dtype)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(rel_x[..., None] - taps))
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(rel_y[..., None] - taps))

        tmp = jnp.einsum("trp,tpqc->trqc", wx.astype(mm_dtype),
                         patches.astype(mm_dtype),
                         preferred_element_type=jnp.float32)
        if mode in ("repeat", "repeat_bf16"):
            # [T,R,P,Cp] * [T,R,P,1] -> sum over P, but done on the flat
            # [T,R,P*Cp] layout so the lane dim stays 768 wide
            prod = tmp.reshape(T, R, patch * Cp) * jnp.repeat(
                wy, Cp, axis=-1)
            samp = jnp.sum(prod.reshape(T, R, patch, Cp), axis=2)
        else:
            samp = jnp.einsum("trq,trqc->trc", wy, tmp)

        density = samp[..., 0]
        feat = samp[..., 1:1 + k0_dim]
        alpha = render.raw2alpha(density, shift_k, interval)
        inb = ((pos[..., 0] >= 0) & (pos[..., 0] <= X - 1)
               & (pos[..., 1] >= 0) & (pos[..., 1] <= Y - 1))
        alpha = jnp.where(inb, alpha, 0.0)
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
            common.mlp_apply(mlp_mm, rgb_feat.astype(mm_dtype), act)
            .astype(jnp.float32))

        w = t_cum * alpha
        if cfg.fast_color_thres > 0:
            w = jnp.where(w > cfg.fast_color_thres, w, 0.0)
        rgb_acc = rgb_acc + w[..., None] * rgb_raw
        depth_acc = depth_acc + w * ((k + 0.5) / Z)
        t_new = t_cum * (1.0 - alpha)
        alive_new = alive & (t_new >= render.EARLY_TERM_THRES)
        return (t_new, rgb_acc, depth_acc, alive_new), None

    init = (jnp.ones((T, R), dtype=jnp.float32),
            jnp.zeros((T, R, 3), dtype=jnp.float32),
            jnp.zeros((T, R), dtype=jnp.float32),
            jnp.ones((T, R), dtype=bool))
    ks = jnp.arange(Z, dtype=jnp.float32)

    if mode == "while_exit":
        # lax.while over plane index: stops when EVERY tile is dead
        def cond(state):
            k, carry = state
            return (k < Z) & jnp.any(carry[3])

        def wbody(state):
            k, carry = state
            carry2, _ = body(carry, (packed[k], act_shift[k],
                                     k.astype(jnp.float32)))
            return (k + 1, carry2)

        _, (t_cum, rgb_acc, depth_acc, _) = jax.lax.while_loop(
            cond, wbody, (jnp.asarray(0, jnp.int32), init))
    else:
        (t_cum, rgb_acc, depth_acc, _), _ = jax.lax.scan(
            body, init, (packed, act_shift, ks))
    return rgb_acc + t_cum[..., None] * bg, depth_acc, t_cum


@functools.partial(jax.jit, static_argnames=("cfg", "interval", "patch", "mode"))
def run2(cfg, params, buffers, a_tiles, b_tiles, vd_tiles, *,
         interval: float, patch: int, mode: str):
    from fourk_nerf_tpu.ops import plane_sweep

    packed, act_shift, _mask = plane_sweep.pack_grids(cfg, params, buffers)
    if mode in ("repeat_bf16", "while_exit"):
        packed = packed.astype(jnp.bfloat16)
    act = common.activation(cfg.act_type)
    return sweep2(packed, act_shift, a_tiles, b_tiles, vd_tiles,
                  params["rgbnet"], cfg=cfg, interval=interval, patch=patch,
                  k0_dim=cfg.k0_dim, bg=1.0, act=act, mode=mode)


def main():
    dev = jax.devices()[0]
    print("device:", dev.platform, dev.device_kind, flush=True)
    cfg, params, buffers, a_tiles, b_tiles, vd_tiles = build_inputs()
    interval = float(1.0 * cfg.voxel_size_ratio)
    results = {}
    for mode in ["repeat", "repeat_bf16", "while_exit"]:
        t0 = time.perf_counter()
        out = run2(cfg, params, buffers, a_tiles, b_tiles, vd_tiles,
                   interval=interval, patch=48, mode=mode)
        _ = np.asarray(out[0])
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = run2(cfg, params, buffers, a_tiles, b_tiles, vd_tiles,
                       interval=interval, patch=48, mode=mode)
            _ = np.asarray(out[0])
            ts.append(time.perf_counter() - t0)
        results[mode] = {"ms": round(float(np.median(ts)) * 1e3, 1),
                         "compile_s": round(compile_s, 1)}
        print(mode, results[mode], flush=True)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()

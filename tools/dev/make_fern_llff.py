#!/usr/bin/env python3
"""Fern-resolution synthetic LLFF dataset for the round-5 long-slice
demonstration (VERDICT r4 item 4): 8 views stored at the fern SR target
resolution 3024x4032 (the LLFF loader minifies factor=4 to the 756x1008
LR frames the reference trains on, `/root/reference/run_sr.py` data
contract), rendered from a smoothed-blob DMPIGO teacher ON THE TPU —
a 12.2M-ray frame through the CPU teacher path would take tens of
minutes/view on this 1-core host, while the plane-sweep renderer does it
in seconds on chip and the uint8 conversion keeps the tunnel pull to
~37 MB/view.

Same pose/bounds storage convention as tools/dev/make_tiny_llff.py
(columns permuted per data/llff.py, bds chosen so bd_factor scaling is
exactly 1); round-trip-checked through the real loader at factor=4.

Run: bash tools/perf/tpu_run.sh tools/dev/make_fern_llff.py /tmp/fernds.log
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from fourk_nerf_tpu.models import dmpigo
from fourk_nerf_tpu.ops import plane_sweep

BASE = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fern_ds/llff/scene"
# fern LLFF geometry: LR 756x1008 at f=815 (factor=4 of the stored frames)
H, W, F = 756, 1008, 815.0
HS, WS, FS = 4 * H, 4 * W, 4 * F
N = 8

os.makedirs(os.path.join(BASE, "images"), exist_ok=True)

KS = np.array([[FS, 0, WS / 2], [0, FS, HS / 2], [0, 0, 1]], np.float32)
c2ws = []
for dx in np.linspace(-0.04, 0.04, N):
    c2w = np.eye(4, dtype=np.float32)
    c2w[0, 3] = dx
    c2w[2, 3] = 1.0
    c2ws.append(c2w[:3, :4])
c2ws = np.stack(c2ws)

# teacher: smoothed blobs at a resolution with real content for 4x SR
# (content detail well above the LR Nyquist so the SR GT isn't trivially
# reconstructible from LR alone)
cfg_t = dmpigo.make_config(
    xyz_min=[-2.0, -2.0, -1.0], xyz_max=[2.0, 2.0, 1.0],
    num_voxels=192 * 192 * 32, mpi_depth=32,
    # plane_sweep.render_frame requires an rgbnet (no rgbnet_dim=0 fast
    # path there); a SCALED random MLP over smoothed features gives
    # structured, view/PE-dependent color with real contrast
    rgbnet_dim=9, rgbnet_depth=3, rgbnet_width=64)
params_t, buffers_t = dmpigo.init(cfg_t, jax.random.PRNGKey(0))
rng = np.random.default_rng(0)
dens = rng.normal(0, 2, params_t["density"].shape).astype(np.float32)
from scipy.ndimage import gaussian_filter
dens = gaussian_filter(dens, sigma=(4, 4, 1.5, 0)) * 8.0
params_t["density"] = jnp.asarray(dens)
k0 = rng.normal(0, 1, params_t["k0"].shape).astype(np.float32)
k0 = gaussian_filter(k0, sigma=(1.5, 1.5, 0.5, 0)) * 3.0
params_t["k0"] = jnp.asarray(k0)
params_t["rgbnet"] = jax.tree.map(lambda w: w * 3.0, params_t["rgbnet"])

assert dmpigo.plane_aligned_ok(cfg_t, 1.0, ndc=True)

to_u8 = jax.jit(lambda x: jnp.clip(x * 255.0 + 0.5, 0, 255).astype(jnp.uint8))

import imageio.v2 as imageio
# the full 3024x4032 frame through the sweep path would materialize
# ~11.9k per-tile patch buffers (~37 GB > 16 GB HBM); render in 8
# horizontal bands instead (a band is production-frame-sized, ~4.7 GB)
# by shifting the principal point -- rays depend on pixels only via K
BANDS = 8
bh = HS // BANDS
assert bh * BANDS == HS
for i, c2w in enumerate(c2ws):
    t0 = time.time()
    rows = []
    for b in range(BANDS):
        Kb = KS.copy()
        Kb[1, 2] -= b * bh
        out = plane_sweep.render_frame(
            cfg_t, params_t, buffers_t, bh, WS, Kb, c2w,
            stepsize=1.0, bg=0.0, tile=32, patch=48)
        rows.append(np.asarray(to_u8(out["rgb_marched"])))
    img = np.concatenate(rows, axis=0)
    imageio.imwrite(os.path.join(BASE, "images", f"im_{i:03d}.png"), img)
    print(f"view {i}: {time.time() - t0:.1f}s  mean={img.mean():.1f}",
          flush=True)

rows = []
for c2w in c2ws:
    stored = np.stack([-c2w[:, 1], c2w[:, 0], c2w[:, 2], c2w[:, 3]], 1)
    hwf = np.array([[HS], [WS], [FS]], np.float32)
    m = np.concatenate([stored, hwf], 1)  # [3,5]
    rows.append(np.concatenate([m.reshape(-1), [4.0 / 3.0, 16.0 / 3.0]]))
np.save(os.path.join(BASE, "poses_bounds.npy"),
        np.stack(rows).astype(np.float64))

# round-trip through the real loader (also pre-builds the images_4 minify
# cache so the training run doesn't pay it)
from fourk_nerf_tpu.data import llff
imgs, depths, poses, bds, render_poses, i_test, sr_gt, w2c = \
    llff.load_llff_data(BASE, factor=4, load_sr=1, spherify=False,
                        recenter=False)
got = np.asarray(poses)[:, :3, :4]
err = np.abs(got - c2ws).max()
print("pose roundtrip err:", err, "imgs:", np.asarray(imgs).shape,
      "srgt:", None if sr_gt is None else np.asarray(sr_gt).shape)
assert err < 1e-5, err
print("fern-scale llff dataset OK at", BASE)

#!/usr/bin/env python3
"""Tiny synthetic LLFF dataset for driving run_sr.py end-to-end on CPU:
renders a random DMPIGO teacher through NDC cameras, writes images/ +
poses_bounds.npy in the LLFF storage convention (inverted from
data/llff.py:265), and a matching SR config."""
import os
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import sys
sys.path.insert(0, "/root/repo")
from fourk_nerf_tpu.models import dmpigo
from fourk_nerf_tpu.ops import rays as ray_ops

import sys
BASE = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_ds/llff/scene"
# MED_LLFF=1: larger scene for the convergence-curve artifact (see
# med_llff_sr_cfg.py); default stays the tiny CPU-drive size
import os as _os
_MED = _os.environ.get("MED_LLFF") == "1"
H, W, F = (64, 80, 90.0) if _MED else (24, 32, 30.0)
N = 8 if _MED else 4

os.makedirs(os.path.join(BASE, "images"), exist_ok=True)

K = np.array([[F, 0, W / 2], [0, F, H / 2], [0, 0, 1]], np.float32)
c2ws = []
for dx in np.linspace(-0.04, 0.04, N):
    c2w = np.eye(4, dtype=np.float32)
    c2w[0, 3] = dx
    c2w[2, 3] = 1.0
    c2ws.append(c2w[:3, :4])
c2ws = np.stack(c2ws)

cfg_t = dmpigo.make_config(
    xyz_min=[-2.0, -2.0, -1.0], xyz_max=[2.0, 2.0, 1.0],
    num_voxels=(96 * 96 * 32 if _MED else 48 * 48 * 16),
    mpi_depth=32 if _MED else 16, rgbnet_dim=0)
params_t, buffers_t = dmpigo.init(cfg_t, jax.random.PRNGKey(0))
rng = np.random.default_rng(0)
dens = rng.normal(0, 2, params_t["density"].shape).astype(np.float32)
if _MED:  # smooth blobs: content with actual spatial structure
    from scipy.ndimage import gaussian_filter
    dens = gaussian_filter(dens, sigma=(3, 3, 1.5, 0)) * 6.0
params_t["density"] = jnp.asarray(dens)
params_t["k0"] = jnp.asarray(rng.normal(0, 1, params_t["k0"].shape).astype(np.float32))

import imageio.v2 as imageio
for i, c2w in enumerate(c2ws):
    ro, rd, vd = ray_ops.get_rays_of_a_view(
        4 * H, 4 * W, K * np.diag([4, 4, 1]).astype(np.float32) @ np.eye(3, dtype=np.float32)
        if False else np.array([[4 * F, 0, 4 * W / 2], [0, 4 * F, 4 * H / 2], [0, 0, 1]], np.float32),
        c2w, ndc=True, inverse_y=False, flip_x=False, flip_y=False)
    out = dmpigo.forward(
        cfg_t, params_t, buffers_t,
        jnp.asarray(np.asarray(ro).reshape(-1, 3)),
        jnp.asarray(np.asarray(rd).reshape(-1, 3)),
        jnp.asarray(np.asarray(vd).reshape(-1, 3)), stepsize=1.0, bg=0.0)
    img = np.clip(np.asarray(out["rgb_marched"]).reshape(4 * H, 4 * W, 3), 0, 1)
    imageio.imwrite(os.path.join(BASE, "images", f"im_{i:03d}.png"),
                    (img * 255).astype(np.uint8))

# store in LLFF convention: the loader permutes COLUMNS (llff.py:265 acts
# on axis 1 of [3,5,N] = matrix columns): loaded_c0 = stored_c1,
# loaded_c1 = -stored_c0 -> stored = [-c2w_c1 | c2w_c0 | c2w_c2 | t].
# bds chosen so bd_factor scaling is exactly 1 (min*0.75 == 1).
rows = []
for c2w in c2ws:
    stored = np.stack([-c2w[:, 1], c2w[:, 0], c2w[:, 2], c2w[:, 3]], 1)
    hwf = np.array([[4 * H], [4 * W], [4 * F]], np.float32)
    m = np.concatenate([stored, hwf], 1)  # [3,5]
    rows.append(np.concatenate([m.reshape(-1), [4.0 / 3.0, 16.0 / 3.0]]))
np.save(os.path.join(BASE, "poses_bounds.npy"), np.stack(rows).astype(np.float64))

# round-trip check through the real loader
from fourk_nerf_tpu.data import llff
imgs, depths, poses, bds, render_poses, i_test, sr_gt, w2c = llff.load_llff_data(
    BASE, factor=4, load_sr=1, spherify=False, recenter=False)
got = np.asarray(poses)[:, :3, :4]
err = np.abs(got - c2ws).max()
print("pose roundtrip err:", err, "imgs:", np.asarray(imgs).shape,
      "srgt:", None if sr_gt is None else np.asarray(sr_gt).shape)
assert err < 1e-5, err
print("llff dataset OK at", BASE)

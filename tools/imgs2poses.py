#!/usr/bin/env python3
"""COLMAP SfM -> ``poses_bounds.npy`` pipeline.

Functional rebuild of the reference's ``tools/imgs2poses.py`` +
``tools/colmap_utils/{colmap_wrapper,pose_utils}.py``: runs the colmap binary
(feature_extractor -> exhaustive_matcher -> mapper) when a sparse model is
missing, then converts the model to the LLFF ``poses_bounds.npy`` layout
([R|t|hwf] per image + per-image near/far percentile depth bounds).

Usage: python tools/imgs2poses.py <scenedir> [--match_type exhaustive_matcher]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from colmap_model import load_sparse_model, qvec2rotmat  # noqa: E402


def run_colmap(basedir: str, match_type: str = "exhaustive_matcher") -> None:
    db = os.path.join(basedir, "database.db")
    sparse = os.path.join(basedir, "sparse")
    os.makedirs(sparse, exist_ok=True)
    logfile = os.path.join(basedir, "colmap_output.txt")
    with open(logfile, "w") as log:
        for cmd in (
            ["colmap", "feature_extractor", "--database_path", db,
             "--image_path", os.path.join(basedir, "images"),
             "--ImageReader.single_camera", "1"],
            ["colmap", match_type, "--database_path", db],
            ["colmap", "mapper", "--database_path", db,
             "--image_path", os.path.join(basedir, "images"),
             "--output_path", sparse,
             "--Mapper.num_threads", "16",
             "--Mapper.init_min_tri_angle", "4",
             "--Mapper.multiple_models", "0",
             "--Mapper.extract_colors", "0"],
        ):
            print("running:", " ".join(cmd))
            subprocess.check_call(cmd, stdout=log, stderr=log)
    print(f"colmap finished (log: {logfile})")


def colmap_to_poses_bounds(basedir: str) -> np.ndarray:
    """Convert sparse/0 to the [N, 17] poses_bounds array LLFF loaders read."""
    cams, images, pts3d = load_sparse_model(os.path.join(basedir, "sparse", "0"))

    cam = next(iter(cams.values()))
    h, w = cam.height, cam.width
    f = cam.params[0]
    hwf = np.array([h, w, f]).reshape(3, 1)

    names = sorted(images, key=lambda k: images[k].name)
    w2c_mats = []
    for k in names:
        im = images[k]
        R = qvec2rotmat(im.qvec)
        t = im.tvec.reshape(3, 1)
        w2c_mats.append(np.concatenate([np.concatenate([R, t], 1), [[0, 0, 0, 1]]], 0))
    w2c_mats = np.stack(w2c_mats)
    c2w_mats = np.linalg.inv(w2c_mats)
    poses = c2w_mats[:, :3, :4].transpose(1, 2, 0)
    # LLFF axis convention: [-y, x, z] (down, right, backwards)
    poses = np.concatenate(
        [poses[:, 1:2, :], poses[:, 0:1, :], -poses[:, 2:3, :], poses[:, 3:4, :],
         np.tile(hwf[..., None], (1, 1, poses.shape[-1]))],
        1,
    )

    pts = np.stack([p.xyz for p in pts3d.values()])
    vis = {k: set(images[k].point3d_ids[images[k].point3d_ids >= 0].tolist()) for k in names}
    pid_index = {p.id: i for i, p in enumerate(pts3d.values())}

    rows = []
    for i, k in enumerate(names):
        ids = [pid_index[pid] for pid in vis[k] if pid in pid_index]
        if ids:
            zvals = (
                -(pts[ids] - c2w_mats[i, :3, 3]) @ c2w_mats[i, :3, 2]
            )
            close, inf = np.percentile(zvals, 0.1), np.percentile(zvals, 99.9)
        else:
            close, inf = 0.01, 100.0
        rows.append(np.concatenate([poses[..., i].ravel(), [close, inf]]))
    return np.stack(rows)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("scenedir")
    p.add_argument("--match_type", default="exhaustive_matcher",
                   choices=["exhaustive_matcher", "sequential_matcher"])
    args = p.parse_args()

    sparse0 = os.path.join(args.scenedir, "sparse", "0")
    if not os.path.isdir(sparse0):
        run_colmap(args.scenedir, args.match_type)
    arr = colmap_to_poses_bounds(args.scenedir)
    out = os.path.join(args.scenedir, "poses_bounds.npy")
    np.save(out, arr)
    print(f"wrote {out}: {arr.shape}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Scene/volume debug export.

Replacement for the reference's Open3D viewers (``tools/vis_train.py``,
``tools/vis_volume.py``) for headless environments: consumes the npz dumps
produced by ``run.py --export_bbox_and_cams_only`` / ``--export_coarse_only``
and writes portable artifacts instead of opening a window --

- ``bbox+cams`` -> a PLY point/line set of the scene bbox and camera frusta
  (open in any mesh viewer);
- ``coarse volume`` -> a thresholded occupancy point cloud PLY.

Usage:
    python tools/vis_export.py bbox  dump.npz out.ply
    python tools/vis_export.py volume coarse.npz out.ply --thres 1e-3
"""

from __future__ import annotations

import argparse

import numpy as np


def write_ply_points(path, xyz, rgb=None):
    n = len(xyz)
    with open(path, "wb") as f:
        header = [
            "ply", "format binary_little_endian 1.0", f"element vertex {n}",
            "property float x", "property float y", "property float z",
        ]
        if rgb is not None:
            header += ["property uchar red", "property uchar green", "property uchar blue"]
        header += ["end_header"]
        f.write(("\n".join(header) + "\n").encode())
        if rgb is None:
            f.write(np.asarray(xyz, dtype="<f4").tobytes())
        else:
            rec = np.empty(n, dtype=[("xyz", "<f4", 3), ("rgb", "u1", 3)])
            rec["xyz"] = xyz
            rec["rgb"] = rgb
            f.write(rec.tobytes())


def export_bbox_cams(npz_path, out_path):
    d = np.load(npz_path)
    xyz_min, xyz_max = d["xyz_min"], d["xyz_max"]
    cams = d["cam_lst"]  # [N, 3, 4] c2w
    pts = []
    # bbox corners
    for cx in (xyz_min[0], xyz_max[0]):
        for cy in (xyz_min[1], xyz_max[1]):
            for cz in (xyz_min[2], xyz_max[2]):
                pts.append([cx, cy, cz])
    # camera centers + forward ticks
    for c2w in cams:
        o = c2w[:3, 3]
        z = c2w[:3, 2]
        for t in np.linspace(0, 0.25, 8):
            pts.append(o - z * t)
    write_ply_points(out_path, np.asarray(pts, dtype=np.float32))
    print(f"wrote {out_path}: {len(pts)} points")


def export_volume(npz_path, out_path, thres):
    d = np.load(npz_path)
    alpha = d["alpha"] if "alpha" in d else d[d.files[0]]
    alpha = np.squeeze(alpha)
    xyz_min = d["xyz_min"] if "xyz_min" in d else np.zeros(3)
    xyz_max = d["xyz_max"] if "xyz_max" in d else np.asarray(alpha.shape, dtype=np.float64)
    idx = np.argwhere(alpha > thres)
    frac = idx / (np.asarray(alpha.shape) - 1)
    xyz = xyz_min + frac * (xyz_max - xyz_min)
    a = alpha[tuple(idx.T)]
    gray = (np.clip(a, 0, 1) * 255).astype(np.uint8)
    rgb = np.stack([gray] * 3, -1)
    write_ply_points(out_path, xyz.astype(np.float32), rgb)
    print(f"wrote {out_path}: {len(xyz)} occupied voxels (thres={thres})")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["bbox", "volume"])
    p.add_argument("npz")
    p.add_argument("out")
    p.add_argument("--thres", type=float, default=1e-3)
    args = p.parse_args()
    if args.mode == "bbox":
        export_bbox_cams(args.npz, args.out)
    else:
        export_volume(args.npz, args.out, args.thres)


if __name__ == "__main__":
    main()

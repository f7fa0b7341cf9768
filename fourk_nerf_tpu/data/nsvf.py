"""NSVF-format dataset loader (reference /root/reference/lib/load_nsvf.py).

Layout: ``pose/*.txt`` 4x4 c2w matrices, ``rgb/*.png`` with a leading split
digit in the filename (0=train, 1=val, 2=test), ``intrinsics.txt`` whose
first number is the focal length.
"""

from __future__ import annotations

import glob
import os

import numpy as np

from fourk_nerf_tpu.data.blender import pose_spherical


def _pose_spherical_nsvf(theta, phi, radius):
    c2w = pose_spherical(theta, phi, radius)
    c2w = c2w.copy()
    c2w[:, [1, 2]] *= -1  # nsvf camera convention flip (reference :36)
    return c2w


def load_nsvf_data(basedir):
    import imageio.v2 as imageio

    pose_paths = sorted(glob.glob(os.path.join(basedir, "pose", "*txt")))
    rgb_paths = sorted(glob.glob(os.path.join(basedir, "rgb", "*png")))

    all_poses, all_imgs = [], []
    i_split = [[], [], []]
    for i, (pose_path, rgb_path) in enumerate(zip(pose_paths, rgb_paths)):
        i_set = int(os.path.basename(rgb_path)[0])
        all_imgs.append((imageio.imread(rgb_path) / 255.0).astype(np.float32))
        all_poses.append(np.loadtxt(pose_path).astype(np.float32))
        i_split[i_set].append(i)

    imgs = np.stack(all_imgs, 0)
    poses = np.stack(all_poses, 0)
    H, W = imgs[0].shape[:2]
    with open(os.path.join(basedir, "intrinsics.txt")) as f:
        focal = float(f.readline().split()[0])

    radius = float(np.sqrt((poses[..., :3, 3] ** 2).sum(-1)).mean())
    render_poses = np.stack(
        [_pose_spherical_nsvf(a, -30.0, radius) for a in np.linspace(-180, 180, 201)[:-1]], 0
    )
    return imgs, poses, render_poses, [H, W, focal], i_split

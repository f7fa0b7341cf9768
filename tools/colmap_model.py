"""Minimal COLMAP binary-model reader.

Self-contained parser for ``cameras.bin`` / ``images.bin`` / ``points3D.bin``
(the standard COLMAP sparse-model format), covering what the pose pipeline
needs. Functional replacement for the reference's vendored
``tools/colmap_utils/colmap_read_model.py``.
"""

from __future__ import annotations

import collections
import os
import struct

import numpy as np

Camera = collections.namedtuple("Camera", ["id", "model", "width", "height", "params"])
Image = collections.namedtuple("Image", ["id", "qvec", "tvec", "camera_id", "name",
                                          "xys", "point3d_ids"])
Point3D = collections.namedtuple("Point3D", ["id", "xyz", "rgb", "error"])

# model_id -> (name, num_params)
_CAMERA_MODELS = {
    0: ("SIMPLE_PINHOLE", 3), 1: ("PINHOLE", 4), 2: ("SIMPLE_RADIAL", 4),
    3: ("RADIAL", 5), 4: ("OPENCV", 8), 5: ("OPENCV_FISHEYE", 8),
    6: ("FULL_OPENCV", 12), 7: ("FOV", 5), 8: ("SIMPLE_RADIAL_FISHEYE", 4),
    9: ("RADIAL_FISHEYE", 5), 10: ("THIN_PRISM_FISHEYE", 12),
}


def _read(f, fmt):
    size = struct.calcsize(fmt)
    return struct.unpack(fmt, f.read(size))


def read_cameras_bin(path) -> dict:
    cams = {}
    with open(path, "rb") as f:
        (n,) = _read(f, "<Q")
        for _ in range(n):
            cam_id, model_id, width, height = _read(f, "<iiQQ")
            name, n_params = _CAMERA_MODELS[model_id]
            params = np.array(_read(f, f"<{n_params}d"))
            cams[cam_id] = Camera(cam_id, name, width, height, params)
    return cams


def read_images_bin(path) -> dict:
    images = {}
    with open(path, "rb") as f:
        (n,) = _read(f, "<Q")
        for _ in range(n):
            img_id = _read(f, "<i")[0]
            qvec = np.array(_read(f, "<4d"))
            tvec = np.array(_read(f, "<3d"))
            cam_id = _read(f, "<i")[0]
            name = b""
            c = f.read(1)
            while c != b"\x00":
                name += c
                c = f.read(1)
            (n_pts,) = _read(f, "<Q")
            data = np.frombuffer(f.read(24 * n_pts), dtype=np.float64).reshape(n_pts, 3)
            xys = data[:, :2]
            ids = data[:, 2].astype(np.int64)
            images[img_id] = Image(img_id, qvec, tvec, cam_id, name.decode(), xys, ids)
    return images


def read_points3d_bin(path) -> dict:
    pts = {}
    with open(path, "rb") as f:
        (n,) = _read(f, "<Q")
        for _ in range(n):
            pid = _read(f, "<Q")[0]
            xyz = np.array(_read(f, "<3d"))
            rgb = np.array(_read(f, "<3B"))
            (err,) = _read(f, "<d")
            (track_len,) = _read(f, "<Q")
            f.read(8 * track_len)  # (image_id, point2d_idx) pairs, unused
            pts[pid] = Point3D(pid, xyz, rgb, err)
    return pts


def qvec2rotmat(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * w * z, 2 * x * z + 2 * w * y],
        [2 * x * y + 2 * w * z, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * w * x],
        [2 * x * z - 2 * w * y, 2 * y * z + 2 * w * x, 1 - 2 * x * x - 2 * y * y],
    ])


def load_sparse_model(model_dir):
    return (
        read_cameras_bin(os.path.join(model_dir, "cameras.bin")),
        read_images_bin(os.path.join(model_dir, "images.bin")),
        read_points3d_bin(os.path.join(model_dir, "points3D.bin")),
    )

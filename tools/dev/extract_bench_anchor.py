#!/usr/bin/env python3
"""Extract the trained-content bench anchor from a joint-SR checkpoint.

Takes a ``fine_last.npz`` written by the joint trainer
(``train/sr_trainer.py::_save_joint``) and distills the ENCODER side into
a small f16 asset (``tools/assets/med_sr_grids_f16.npz``) that
``bench.py::load_trained_fern_scale`` upsamples to the fern benchmark
resolution.  Keeps only what the bench needs: density + k0 grids (f16),
the rgbnet MLP (f32 -- tiny), scene bounds and PE settings.

Usage:
    python tools/dev/extract_bench_anchor.py /tmp/med_ds/logs/med_sr/fine_last.npz
    python tools/dev/extract_bench_anchor.py <fern_ckpt.npz> <out_name.npz> 96x96x64

The optional third argument trilinearly downsamples the grids before
saving -- a fern-scale checkpoint's full grids are ~750 MB of f16 and
can't be committed; a 96x96x64 distillation keeps the TRAINED sparsity
structure (what the anchor exists to exercise) at ~11 MB.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/med_ds/logs/med_sr/fine_last.npz"
    name = sys.argv[2] if len(sys.argv) > 2 else "med_sr_grids_f16.npz"
    down = None
    if len(sys.argv) > 3:
        down = tuple(int(v) for v in sys.argv[3].split("x"))
    dst = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                       "assets", name)
    z = np.load(src, allow_pickle=True)
    meta = json.loads(bytes(z["__meta__"]).decode("utf-8"))
    mk = meta["model_kwargs"]
    density = z["params/density"].astype(np.float32)
    k0 = z["params/k0"].astype(np.float32)
    if down is not None:
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..", ".."))
        import jax
        jax.config.update("jax_platforms", "cpu")
        from fourk_nerf_tpu.ops import grid_sample

        density = np.asarray(grid_sample.resize_trilinear_chunked(
            density, down))
        k0 = np.asarray(grid_sample.resize_trilinear_chunked(k0, down))
    out = {
        "density": density.astype(np.float16),
        "k0": k0.astype(np.float16),
        "xyz_min": np.asarray(mk["xyz_min"], np.float32),
        "xyz_max": np.asarray(mk["xyz_max"], np.float32),
        "viewbase_pe": np.int32(mk["viewbase_pe"]),
        "spatial_pe": np.int32(mk["spatial_pe"]),
    }
    for k in z.files:
        if k.startswith("params/rgbnet/"):
            out["rgbnet_" + k.split("/")[-1]] = z[k].astype(np.float32)
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    np.savez_compressed(dst, **out)
    print(f"wrote {os.path.abspath(dst)} "
          f"({os.path.getsize(dst) / 1e6:.1f} MB) from {src} "
          f"(global_step {meta['global_step']})")


if __name__ == "__main__":
    main()

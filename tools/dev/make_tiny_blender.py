"""Build a tiny blender-format dataset + config for end-to-end CLI verify
(recipe: .claude/skills/verify/SKILL.md; scene from tests/test_train_smoke.py)."""
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
import numpy as np
from PIL import Image

from test_train_smoke import _make_synthetic_scene

OUT = "/tmp/verify_ds/blender"
H = W = 24
dd = _make_synthetic_scene(H=H, W=W, n_views=8)
focal = dd["hwf"][2]
cam_x = float(2 * np.arctan(0.5 * W / focal))

for split, idx in (("train", dd["i_train"]), ("val", dd["i_val"]),
                   ("test", dd["i_test"])):
    d = os.path.join(OUT, split)
    os.makedirs(d, exist_ok=True)
    frames = []
    for i in idx:
        img = (np.clip(dd["images"][i], 0, 1) * 255).astype(np.uint8)
        name = f"r_{int(i)}"
        Image.fromarray(img).save(os.path.join(d, name + ".png"))
        c2w = np.eye(4)
        c2w[:3, :4] = dd["poses"][i]
        frames.append({"file_path": f"./{split}/{name}",
                       "transform_matrix": c2w.tolist()})
    with open(os.path.join(OUT, f"transforms_{split}.json"), "w") as f:
        json.dump({"camera_angle_x": cam_x, "frames": frames}, f)

cfg = """\
_base_ = '/root/repo/fourk_nerf_tpu/configs/syn/syn_default.py'
expname = 'verify'
basedir = '/tmp/verify_ds/logs'
data = dict(datadir='/tmp/verify_ds/blender', dataset_type='blender',
            white_bkgd=True, half_res=False, testskip=1)
coarse_train = dict(N_iters=60, N_rand=256, pervoxel_lr=True, pg_scale=[])
fine_train = dict(N_iters=40, N_rand=256, pg_scale=[20],
                  ray_sampler='in_maskcache')
coarse_model_and_render = dict(num_voxels=12**3, num_voxels_base=12**3,
                               alpha_init=1e-2)
fine_model_and_render = dict(num_voxels=16**3, num_voxels_base=16**3,
                             rgbnet_dim=6, rgbnet_width=16,
                             world_bound_scale=1.05)
"""
with open("/tmp/verify_ds/tiny_cfg.py", "w") as f:
    f.write(cfg)
print("dataset + config written to /tmp/verify_ds")

"""Fern-scale long-slice joint config (VERDICT r4 item 4): the published
fern joint objective (configs/llff/fern_lg_joint_l1_gan.py — weight_pcp=0.5,
weight_gan=0.05, weight_style=0.2, N_patch=64, pg_scale [2000,4000,6000,8000],
full 384x384x256 grid after the last boundary) on the fern-resolution
synthetic dataset from tools/dev/make_fern_llff.py, run for a >=2h slice on
one chip with a mid-run kill+resume. The perceptual/style tower uses the
deterministic fixed-seed random VGG (allow_random_vgg) — no pretrained VGG19
exists in this zero-egress image.

N_iters=60000 (>=50k windowed iters, ~70 min of step time at the measured
~14.6 it/s, plus occupancy renewals every 1000 steps, four pg_scale re-jits,
vals and two async fern-scale checkpoint pulls).
"""
_base_ = '/root/repo/fourk_nerf_tpu/configs/llff/fern_lg_joint_l1_gan.py'

expname = 'fern_slice'
basedir = '/tmp/fern_ds/logs'

data = dict(
    datadir='/tmp/fern_ds/llff/scene',
)

fine_train = dict(
    N_iters=60000,
    allow_random_vgg=True,
)

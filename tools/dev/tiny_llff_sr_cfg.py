"""Tiny LLFF joint-SR drive config (synthetic scene from make_llff.py)."""
_base_ = '/root/repo/fourk_nerf_tpu/configs/llff/llff_default_lg.py'

expname = 'verify_sr'
basedir = '/tmp/verify_ds/logs'

data = dict(
    datadir='/tmp/verify_ds/llff/scene',
    dataset_type='llff',
    load_sr=1,
    llffhold=4,
    factor=4,
    width=None,
    height=None,
)

coarse_train = dict(N_iters=0)

fine_train = dict(
    N_iters=25,
    N_patch=8,
    ray_sampler='patch_mimg',
    lrate_srnet=2e-4,
    weight_entropy_last=0.001,
    pg_scale=[],
    tv_before=0,
    tv_dense_before=0,
)

_mpi_depth = 16
fine_model_and_render = dict(
    num_voxels=24 * 24 * _mpi_depth,
    mpi_depth=_mpi_depth,
    mode_type='mlp',
    viewbase_pe=0,
    spatial_pe=0,
    num_cond=1,
    dim_rend=3,
    act_type='relu',
    d_model='Unet',
    rgbnet_dim=9,
    rgbnet_depth=3,
    rgbnet_width=32,
)

"""Medium synthetic-LLFF joint-SR convergence config (scene from
make_tiny_llff.py with MED_LLFF=1): 64x80 LR / 256x320 HR x 8 views.
Used for the committed convergence curves + trained-content bench anchor
(logs/curves_r3; VERDICT round-2 item 5)."""
_base_ = '/root/repo/fourk_nerf_tpu/configs/llff/llff_default_lg.py'

expname = 'med_sr'
basedir = '/tmp/med_ds/logs'

data = dict(
    datadir='/tmp/med_ds/llff/scene',
    dataset_type='llff',
    load_sr=1,
    llffhold=8,
    factor=4,
    width=None,
    height=None,
)

coarse_train = dict(N_iters=0)

fine_train = dict(
    N_iters=3000,
    N_patch=32,
    ray_sampler='patch_mimg',
    lrate_srnet=2e-4,
    weight_entropy_last=0.001,
    pg_scale=[1000],
    tv_before=0,
    tv_dense_before=0,
)

_mpi_depth = 64
fine_model_and_render = dict(
    num_voxels=96 * 96 * _mpi_depth,
    mpi_depth=_mpi_depth,
    mode_type='mlp',
    viewbase_pe=4,
    spatial_pe=2,
    num_cond=1,
    dim_rend=3,
    act_type='relu',
    d_model='Unet',
    rgbnet_dim=9,
    rgbnet_depth=3,
    rgbnet_width=64,
)

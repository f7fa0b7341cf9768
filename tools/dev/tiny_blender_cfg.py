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

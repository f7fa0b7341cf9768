import numpy as np
import jax
import jax.numpy as jnp

from fourk_nerf_tpu.models import dmpigo


def test_update_occupancy_cache_lt_nviews():
    cfg = dmpigo.make_config(
        xyz_min=[-1, -1, 0], xyz_max=[1, 1, 1], num_voxels=12 * 12 * 8, mpi_depth=8,
        rgbnet_dim=4, rgbnet_width=8,
    )
    params, buffers = dmpigo.init(cfg, jax.random.PRNGKey(0))
    # two views: one covers the left half, one covers everything
    rng = np.random.default_rng(0)

    def rays(x_lo, x_hi, n=512):
        ro = np.stack([rng.uniform(x_lo, x_hi, n), rng.uniform(-0.9, 0.9, n),
                       np.full(n, 0.0)], -1).astype(np.float32)
        rd = np.stack([np.zeros(n), np.zeros(n), np.ones(n)], -1).astype(np.float32)
        return ro, rd

    ro1, rd1 = rays(-0.9, -0.1)   # left half only
    ro2, rd2 = rays(-0.9, 0.9)    # full span
    new_buffers = dmpigo.update_occupancy_cache_lt_nviews(
        cfg, buffers, [ro1, ro2], [rd1, rd2], stepsize=1.0, maskout_lt_nviews=2
    )
    mask = np.asarray(new_buffers["mask_cache"])
    X = mask.shape[0]
    # left-side voxels are seen by both views, right side by only one
    assert mask[: X // 3].any()
    assert not mask[-X // 3:].any()
    # threshold=1 keeps the right side too
    b1 = dmpigo.update_occupancy_cache_lt_nviews(
        cfg, buffers, [ro1, ro2], [rd1, rd2], stepsize=1.0, maskout_lt_nviews=1
    )
    assert np.asarray(b1["mask_cache"]).sum() > mask.sum()

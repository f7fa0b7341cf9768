import numpy as np
import jax.numpy as jnp
import pytest
from scipy.ndimage import map_coordinates, maximum_filter

from fourk_nerf_tpu.ops import grid_sample


pytestmark = __import__('pytest').mark.smoke

def test_trilinear_matches_scipy_in_bounds():
    rng = np.random.default_rng(0)
    grid = rng.normal(size=(5, 6, 7, 3)).astype(np.float32)
    pts01 = rng.uniform(0.05, 0.95, size=(100, 3)).astype(np.float32)
    out = np.asarray(grid_sample.trilinear_sample(jnp.asarray(grid), jnp.asarray(pts01)))
    # scipy oracle: order-1 spline == trilinear; coords in voxel units
    coords = pts01 * (np.array(grid.shape[:3]) - 1)
    for c in range(3):
        ref = map_coordinates(grid[..., c], coords.T, order=1, mode="nearest")
        assert np.allclose(out[:, c], ref, atol=1e-5)


def test_trilinear_zeros_padding_outside():
    grid = jnp.ones((4, 4, 4, 1))
    pts = jnp.array([[-0.5, 0.5, 0.5], [1.5, 0.5, 0.5]])
    out = np.asarray(grid_sample.trilinear_sample(grid, pts))
    assert np.allclose(out, 0.0)


def test_trilinear_partial_border_fade():
    # just outside the boundary: contribution fades linearly (zeros padding)
    grid = jnp.ones((4, 4, 4, 1))
    eps_vox = 0.5  # half a voxel beyond the edge
    u = -eps_vox / 3.0  # normalized coordinate for index -0.5 on size-4 axis
    out = np.asarray(grid_sample.trilinear_sample(grid, jnp.array([[u, 0.5, 0.5]])))
    assert np.allclose(out, 0.5, atol=1e-6)


def test_grid_query_world_coords():
    grid = jnp.arange(8.0).reshape(2, 2, 2, 1)
    xyz_min = jnp.array([-1.0, -1.0, -1.0])
    xyz_max = jnp.array([1.0, 1.0, 1.0])
    # the exact corner (1,1,1) -> index (1,1,1) -> value 7
    out = grid_sample.grid_query(grid, jnp.array([[1.0, 1.0, 1.0]]), xyz_min, xyz_max)
    assert np.allclose(out, 7.0)
    # center: average of all corners
    out = grid_sample.grid_query(grid, jnp.array([[0.0, 0.0, 0.0]]), xyz_min, xyz_max)
    assert np.allclose(out, 3.5)


def test_nearest_mask_lookup():
    mask = np.zeros((4, 4, 4), dtype=bool)
    mask[1, 2, 3] = True
    xyz_min = jnp.zeros(3)
    xyz_max = jnp.array([3.0, 3.0, 3.0])  # grid index == world coordinate
    pts = jnp.array(
        [
            [1.0, 2.0, 3.0],   # exactly the occupied voxel
            [1.4, 2.4, 2.6],   # rounds to (1,2,3)
            [0.0, 0.0, 0.0],   # empty voxel
            [-1.0, 2.0, 3.0],  # outside -> False
            [3.6, 2.0, 3.0],   # rounds to 4 -> out of range -> False
        ]
    )
    out = np.asarray(grid_sample.nearest_mask_lookup(jnp.asarray(mask), pts, xyz_min, xyz_max))
    assert out.tolist() == [True, True, False, False, False]


def test_resize_trilinear_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    grid = rng.normal(size=(5, 6, 7, 2)).astype(np.float32)
    new_size = (9, 4, 11)
    ours = np.asarray(grid_sample.resize_trilinear(jnp.asarray(grid), new_size))
    t = torch.from_numpy(grid).permute(3, 0, 1, 2)[None]  # [1,C,X,Y,Z]
    ref = torch.nn.functional.interpolate(
        t, size=new_size, mode="trilinear", align_corners=True
    )[0].permute(1, 2, 3, 0).numpy()
    assert np.allclose(ours, ref, atol=1e-5)


def test_max_pool3d_same():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(5, 6, 7)).astype(np.float32)
    ours = np.asarray(grid_sample.max_pool3d_same(jnp.asarray(x)))
    ref = maximum_filter(x, size=3, mode="constant", cval=-np.inf)
    assert np.allclose(ours, ref)


def test_resize_trilinear_chunked_matches_unchunked():
    # The memory-bounded slab variant bench.py uses for the trained anchor
    # must match the reference resize (to jit-vs-eager float reassociation,
    # ~1 ulp), including when nz is not a multiple of z_chunk (trailing slab
    # is cropped).
    rng = np.random.default_rng(3)
    grid = jnp.asarray(rng.normal(size=(5, 6, 7, 2)).astype(np.float32))
    for new_size, z_chunk in [((9, 4, 11), 4), ((9, 4, 12), 4), ((3, 3, 1), 8)]:
        ref = grid_sample.resize_trilinear(grid, new_size)
        chk = grid_sample.resize_trilinear_chunked(grid, new_size, z_chunk=z_chunk)
        assert chk.shape == ref.shape
        assert np.allclose(np.asarray(ref), np.asarray(chk), atol=1e-5)

import numpy as np
import jax.numpy as jnp

from fourk_nerf_tpu.ops import rays as ray_ops


pytestmark = __import__('pytest').mark.smoke

def _simple_cam(H=4, W=6, focal=10.0):
    K = np.array([[focal, 0, W / 2.0], [0, focal, H / 2.0], [0, 0, 1]], dtype=np.float32)
    c2w = np.eye(4, dtype=np.float32)
    return K, c2w


def test_get_rays_identity_pose_center_mode():
    H, W = 4, 6
    K, c2w = _simple_cam(H, W)
    rays_o, rays_d = ray_ops.get_rays(H, W, K, c2w, inverse_y=False, flip_x=False, flip_y=False)
    assert rays_o.shape == (H, W, 3) and rays_d.shape == (H, W, 3)
    # all origins at camera center
    assert np.allclose(rays_o, 0.0)
    # OpenGL convention: looking down -z
    assert np.all(np.asarray(rays_d)[..., 2] == -1.0)
    # pixel (h, w) center direction: x=(w+0.5-cx)/f, y=-(h+0.5-cy)/f
    h, w = 1, 2
    expected_x = (w + 0.5 - K[0][2]) / K[0][0]
    expected_y = -(h + 0.5 - K[1][2]) / K[1][1]
    assert np.allclose(rays_d[h, w, 0], expected_x, atol=1e-6)
    assert np.allclose(rays_d[h, w, 1], expected_y, atol=1e-6)


def test_get_rays_inverse_y():
    H, W = 4, 6
    K, c2w = _simple_cam(H, W)
    _, rays_d = ray_ops.get_rays(H, W, K, c2w, inverse_y=True, flip_x=False, flip_y=False)
    assert np.all(np.asarray(rays_d)[..., 2] == 1.0)


def test_get_rays_rotation_applied():
    H, W = 2, 2
    K, _ = _simple_cam(H, W)
    # 90-degree rotation about y: x_world = -z_cam, z_world = x_cam
    c2w = np.array(
        [[0, 0, -1, 5], [0, 1, 0, 0], [1, 0, 0, 0], [0, 0, 0, 1]], dtype=np.float32
    )
    rays_o, rays_d = ray_ops.get_rays(H, W, K, c2w, inverse_y=False, flip_x=False, flip_y=False)
    assert np.allclose(rays_o[0, 0], [5, 0, 0])
    d_cam = np.array([(0.5 - K[0][2]) / K[0][0], -(0.5 - K[1][2]) / K[1][1], -1.0])
    expected = c2w[:3, :3] @ d_cam
    assert np.allclose(rays_d[0, 0], expected, atol=1e-6)


def test_ndc_rays_maps_near_plane_to_minus_one():
    # a central ray: origin at z=0 looking down -z; near plane at z=-1
    H = W = 100
    focal = 50.0
    rays_o = jnp.array([[0.0, 0.0, 0.0]])
    rays_d = jnp.array([[0.0, 0.0, -1.0]])
    o_ndc, d_ndc = ray_ops.ndc_rays(H, W, focal, 1.0, rays_o, rays_d)
    # central ray: x=y=0; z starts at -1 (near plane) and d_z spans to +1 at inf
    assert np.allclose(o_ndc, [0.0, 0.0, -1.0], atol=1e-6)
    assert np.allclose(d_ndc, [0.0, 0.0, 2.0], atol=1e-6)
    # point at t=1 (infinity in ndc): o+d = [0,0,1]
    assert np.allclose(np.asarray(o_ndc + d_ndc)[0, 2], 1.0, atol=1e-6)


def test_viewdirs_unit_norm_pre_ndc():
    H, W = 4, 6
    K, c2w = _simple_cam(H, W)
    _, _, viewdirs = ray_ops.get_rays_of_a_view(
        H, W, K, c2w, ndc=True, inverse_y=False, flip_x=False, flip_y=False
    )
    assert np.allclose(np.linalg.norm(np.asarray(viewdirs), axis=-1), 1.0, atol=1e-5)


def test_positional_encoding():
    x = jnp.array([[0.5, -0.25, 1.0]])
    out = ray_ops.positional_encoding(x, 2)
    assert out.shape == (1, 3 + 3 * 2 * 2)
    # layout: [x, sin(x*1), sin(x*2), ..., cos...]
    assert np.allclose(out[0, :3], [0.5, -0.25, 1.0])
    assert np.allclose(out[0, 3], np.sin(0.5), atol=1e-6)
    assert np.allclose(out[0, 4], np.sin(1.0), atol=1e-6)
    assert out.shape == ray_ops.positional_encoding(x, 0).shape or True
    assert ray_ops.positional_encoding(x, 0).shape == (1, 3)

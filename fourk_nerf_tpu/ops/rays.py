"""Camera-ray generation and NDC projection.

Semantics match the reference helpers (/root/reference/lib/dvgo.py:516-582):
pixel centers at +0.5, optional x/y flips, OpenGL (-z forward) vs
inverse-y camera conventions, and the standard forward-facing NDC warp.
All functions are jittable and operate on `jnp` arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def get_rays(H, W, K, c2w, inverse_y: bool, flip_x: bool, flip_y: bool, mode: str = "center",
             key: jax.Array | None = None):
    """Generate per-pixel camera rays for an HxW image.

    Returns (rays_o, rays_d), both [H, W, 3]. ``mode`` is one of
    'lefttop' | 'center' | 'random' (random requires ``key``).
    Reference: /root/reference/lib/dvgo.py:516-544.
    """
    K = jnp.asarray(K)
    c2w = jnp.asarray(c2w)
    j, i = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij"
    )
    if mode == "lefttop":
        pass
    elif mode == "center":
        i, j = i + 0.5, j + 0.5
    elif mode == "random":
        assert key is not None, "random ray jitter needs a PRNG key"
        ki, kj = jax.random.split(key)
        i = i + jax.random.uniform(ki, i.shape)
        j = j + jax.random.uniform(kj, j.shape)
    else:
        raise NotImplementedError(mode)

    if flip_x:
        i = i[:, ::-1]
    if flip_y:
        j = j[::-1, :]
    if inverse_y:
        dirs = jnp.stack([(i - K[0][2]) / K[0][0], (j - K[1][2]) / K[1][1], jnp.ones_like(i)], -1)
    else:
        dirs = jnp.stack(
            [(i - K[0][2]) / K[0][0], -(j - K[1][2]) / K[1][1], -jnp.ones_like(i)], -1
        )
    # rotate ray directions from camera frame to world frame; elementwise
    # (VPU) rather than a matmul so camera geometry never drops to bf16
    # under TPU default matmul precision
    rays_d = jnp.sum(dirs[..., None, :] * c2w[:3, :3], -1)
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o, rays_d


def ndc_rays(H, W, focal, near, rays_o, rays_d):
    """Warp rays into normalized device coordinates (forward-facing scenes).

    Reference: /root/reference/lib/dvgo.py:557-574.
    """
    # shift ray origins to the near plane
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    o0 = -1.0 / (W / (2.0 * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (H / (2.0 * focal)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = -1.0 / (W / (2.0 * focal)) * (rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2])
    d1 = -1.0 / (H / (2.0 * focal)) * (rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2])
    d2 = -2.0 * near / rays_o[..., 2]

    return jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1)


def get_rays_of_a_view(H, W, K, c2w, ndc: bool, inverse_y: bool, flip_x: bool, flip_y: bool,
                       mode: str = "center", key: jax.Array | None = None):
    """Rays + unit view directions for one camera pose.

    Returns (rays_o, rays_d, viewdirs), each [H, W, 3].
    Reference: /root/reference/lib/dvgo.py:577-582.
    """
    rays_o, rays_d = get_rays(H, W, K, c2w, inverse_y=inverse_y, flip_x=flip_x, flip_y=flip_y,
                              mode=mode, key=key)
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    if ndc:
        rays_o, rays_d = ndc_rays(H, W, K[0][0], 1.0, rays_o, rays_d)
    return rays_o, rays_d, viewdirs


def positional_encoding(x, n_freqs: int):
    """[..., C] -> [..., C*(1+2*n_freqs)]: identity ++ sin/cos at 2^k freqs.

    Matches the reference's inline viewdir/spatial embedding
    (/root/reference/lib/dmpigo.py:347-351).
    """
    if n_freqs == 0:
        return x
    freqs = 2.0 ** jnp.arange(n_freqs, dtype=x.dtype)
    xb = x[..., None] * freqs  # [..., C, n_freqs]
    xb = xb.reshape(*x.shape[:-1], -1)
    return jnp.concatenate([x, jnp.sin(xb), jnp.cos(xb)], axis=-1)

"""Volume-rendering math on fixed-shape ``[rays, samples]`` tensors.

This module is the TPU-native replacement for the reference CUDA extension
``render_utils_cuda`` (/root/reference/lib/cuda/render_utils_kernel.cu). The
reference operates on a ragged, thrice-compacted flat point list indexed by
``ray_id``; XLA wants static shapes, so we keep the dense ``[N, K]`` layout and
fold every compaction into the alpha values:

  dropping a sample from the reference's ragged list removes its ``(1-alpha)``
  factor from the transmittance product -- identical to setting ``alpha=0`` in
  the dense product. Weight-threshold culling (mask3) becomes zeroing weights.
  The results are therefore EXACTLY equal (not approximately), while the
  compositing reduces along the sample axis with no scatter at all.

Early ray termination (transmittance < 1e-3,
render_utils_kernel.cu:596-600) is reproduced with a mask over the
post-sample transmittance, including its effect on ``alphainv_last``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EARLY_TERM_THRES = 1e-3  # reference render_utils_kernel.cu:597


def raw2alpha(density, shift, interval):
    """alpha = 1 - (1 + exp(density + shift))^(-interval).

    Numerically-stable softplus form; its autodiff gradient
    ``interval * (1+e)^(-interval-1) * e`` equals the reference backward with
    the reference's 1e10 clamp made unnecessary (reference
    render_utils_kernel.cu:430-516, lib/dvgo.py:453-477).
    """
    return 1.0 - jnp.exp(-jax.nn.softplus(density + shift) * interval)


def alpha2weight(alpha, valid=None):
    """Transmittance-weighted compositing weights along the sample axis.

    Args:
      alpha: ``[N, K]`` per-sample opacities, near-to-far along axis 1.
      valid: optional ``[N, K]`` bool; invalid samples behave as alpha=0
        (= the reference's ragged compaction, see module docstring).

    Returns:
      weights: ``[N, K]`` with ``w_k = T_k * alpha_k`` (0 after early
        termination).
      alphainv_last: ``[N]`` the final transmittance; when the early-exit
        threshold trips, this is the transmittance at the break point,
        matching alpha2weight_cuda (render_utils_kernel.cu:576-605).
      T: ``[N, K]`` transmittance before each sample (for reuse/debug).
    """
    if valid is not None:
        alpha = jnp.where(valid, alpha, 0.0)
    one_minus = 1.0 - alpha
    t_post = jnp.cumprod(one_minus, axis=-1)  # T after sample k
    T = jnp.concatenate([jnp.ones_like(t_post[:, :1]), t_post[:, :-1]], axis=-1)
    # sample k runs iff no earlier post-transmittance dropped below threshold
    alive = T >= EARLY_TERM_THRES  # t_post is non-increasing => alive is prefix-true
    weights = jnp.where(alive, T * alpha, 0.0)
    # alphainv_last: t_post at the last alive sample
    last_alive = jnp.maximum(jnp.sum(alive, axis=-1) - 1, 0)
    alphainv_last = jnp.take_along_axis(t_post, last_alive[:, None], axis=-1)[:, 0]
    # rays whose first sample already has T < thres never enter the loop: T_cum stays 1
    any_alive = alive[:, 0]
    alphainv_last = jnp.where(any_alive, alphainv_last, 1.0)
    return weights, alphainv_last, T


def composite(weights, values):
    """``sum_k w_k * v_k`` along the sample axis.

    Replaces ``torch_scatter.segment_coo`` ray compositing
    (/root/reference/lib/dmpigo.py:382-386): with rays as the leading axis the
    segmented scatter-sum becomes a plain reduction.

    Args:
      weights: ``[N, K]``; values: ``[N, K, C]`` or ``[N, K]``.
    """
    if values.ndim == weights.ndim:
        return jnp.sum(weights * values, axis=-1)
    return jnp.sum(weights[..., None] * values, axis=-2)


def sample_ndc_pts_on_rays(rays_o, rays_d, n_samples: int):
    """Fixed-count equidistant sampling in NDC: ``p_k = o + d * k/(K-1)``.

    Matches ``sample_ndc_pts_on_rays_cuda`` (render_utils_kernel.cu:244-293).
    Returns ``[N, K, 3]`` points; in-bbox masking is done by the caller.
    """
    dist = jnp.arange(n_samples, dtype=rays_o.dtype) / (n_samples - 1)
    return rays_o[:, None, :] + rays_d[:, None, :] * dist[None, :, None]


def ray_aabb(rays_o, rays_d, xyz_min, xyz_max, near, far):
    """Ray/axis-aligned-box entry and exit distances, clamped to [near, far].

    Matches ``infer_t_minmax_cuda`` (render_utils_kernel.cu:11-35) including
    the 1e-6 guard for axis-parallel rays.
    """
    vec = jnp.where(rays_d == 0, 1e-6, rays_d)
    rate_a = (xyz_max - rays_o) / vec
    rate_b = (xyz_min - rays_o) / vec
    t_min = jnp.clip(jnp.max(jnp.minimum(rate_a, rate_b), axis=-1), near, far)
    t_max = jnp.clip(jnp.min(jnp.maximum(rate_a, rate_b), axis=-1), near, far)
    return t_min, t_max


def sample_pts_on_rays_fixed(rays_o, rays_d, xyz_min, xyz_max, near, far, stepdist,
                             n_samples: int):
    """Bounded-scene ray sampling as a fixed ``[N, K]`` lattice + validity mask.

    The reference emits a *variable* number of samples per ray
    (``sample_pts_on_rays_cuda``, render_utils_kernel.cu:196-242): ray k gets
    ``ceil((t_max-t_min)*|d|/stepdist)`` samples starting at its own ``t_min``,
    stepping ``stepdist`` along the unit direction, then drops out-of-bbox
    points. Here every ray gets the same K (the caller passes the reference's
    static upper bound ``K = int((max_world_size-1)/stepsize)+1``,
    lib/dvgo.py:311) and extra samples are masked invalid -- they carry
    alpha=0 through :func:`alpha2weight`, which reproduces the ragged result
    exactly.

    Returns:
      pts: ``[N, K, 3]`` sample positions.
      valid: ``[N, K]`` bool, True for samples the reference would keep
        (within the per-ray count AND inside the bbox).
      t_min: ``[N]`` ray entry distances.
    """
    far_inf = 1e9  # the reference overrides far (lib/dvgo.py:307)
    t_min, t_max = ray_aabb(rays_o, rays_d, xyz_min, xyz_max, near, far_inf)
    rnorm = jnp.linalg.norm(rays_d, axis=-1)
    n_per_ray = jnp.maximum(jnp.ceil((t_max - t_min) * rnorm / stepdist), 1.0)
    rays_start = rays_o + rays_d * t_min[:, None]
    rays_unit = rays_d / rnorm[:, None]
    k = jnp.arange(n_samples, dtype=rays_o.dtype)
    pts = rays_start[:, None, :] + rays_unit[:, None, :] * (stepdist * k)[None, :, None]
    in_count = k[None, :] < n_per_ray[:, None]
    in_bbox = jnp.all((pts >= xyz_min) & (pts <= xyz_max), axis=-1)
    return pts, in_count & in_bbox, t_min


def distortion_loss(weights, s, interval, n_rays=None):
    """Efficient O(K) distortion loss on dense ``[N, K]`` weights.

    ``L = (sum_k 2 w_k (s_k * Wex_k - WSex_k) + interval/3 * sum_k w_k^2) / N``
    with exclusive prefix sums ``Wex``/``WSex`` per ray -- the closed form the
    reference computes with ``segment_cumsum`` (/root/reference/lib/dcvgo.py:385-407)
    and ``torch_efficient_distloss.flatten_eff_distloss`` (run.py:535-541).
    Masked samples must already have weight 0 (then they contribute nothing).
    """
    n = n_rays if n_rays is not None else weights.shape[0]
    ws = weights * s
    w_prefix = jnp.cumsum(weights, axis=-1) - weights  # exclusive
    ws_prefix = jnp.cumsum(ws, axis=-1) - ws
    loss_bi = 2.0 * weights * (s * w_prefix - ws_prefix)
    loss_uni = (1.0 / 3.0) * interval * weights**2
    return (jnp.sum(loss_bi) + jnp.sum(loss_uni)) / n


def total_variation_grad(grid, wx, wy, wz, sparse_grad=None):
    """Gradient of the clamped total-variation regularizer over ``[X,Y,Z,C]``.

    Reproduces ``total_variation_add_grad_cuda``
    (/root/reference/lib/cuda/total_variation_kernel.cu:13-67) including its
    axis convention: with the grid flattened C-contiguously over (X, Y, Z),
    the kernel applies its ``wx`` to the *innermost* (Z) axis and ``wz`` to the
    outermost (X) axis, each pre-divided by 6. ``sparse_grad``: if given,
    voxels whose existing gradient is zero receive no TV gradient (the
    reference's sparse mode keyed off ``grad[index]!=0``).

    Returns the TV gradient (add it to the parameter gradient).
    """

    def diff_contrib(g, axis, w):
        d_next = jnp.clip(g - jnp.roll(g, -1, axis=axis), -1.0, 1.0)
        d_prev = jnp.clip(g - jnp.roll(g, 1, axis=axis), -1.0, 1.0)
        # zero the wrap-around contributions at the boundaries
        n = g.shape[axis]
        idx = jnp.arange(n)
        shape = [1, 1, 1, 1]
        shape[axis] = n
        idx = idx.reshape(shape)
        d_next = jnp.where(idx == n - 1, 0.0, d_next)
        d_prev = jnp.where(idx == 0, 0.0, d_prev)
        return w * (d_next + d_prev)

    tv = (
        diff_contrib(grid, 2, wx / 6.0)  # innermost spatial axis (Z) <- wx
        + diff_contrib(grid, 1, wy / 6.0)
        + diff_contrib(grid, 0, wz / 6.0)  # outermost (X) <- wz
    )
    if sparse_grad is not None:
        tv = jnp.where(sparse_grad != 0, tv, 0.0)
    return tv

"""JAX equivalents of the reference's StyleGAN3-heritage fused ops.

The reference ships five CUDA plugins under torch_utils/ops (SURVEY.md
section 2.2, N5-N10). On TPU, XLA fuses bias+activation chains natively and
``conv_general_dilated`` expresses FIR resampling exactly, so these are thin
jittable functions, not kernels:

- :func:`bias_act`   -- torch_utils/ops/bias_act.py (9 activations w/ gain+clamp)
- :func:`upfirdn2d`  -- torch_utils/ops/upfirdn2d.py (up-FIR-down resampling)
- :func:`filtered_lrelu` -- torch_utils/ops/filtered_lrelu.py (up->bias->
  lrelu->clamp->down)
- :func:`hash_encode` -- torch_utils/ops/hash_sample.py (instant-NGP style
  multiresolution hash grid; dormant in the reference but part of its surface)
- :func:`topp_masking` -- torch_utils/ops/nerf_utils.py (top-p weight mask)

The gradient-fix shims (conv2d_gradfix, grid_sample_gradfix, fma) have no
equivalent here: JAX autodiff provides arbitrary-order gradients natively.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# bias_act: the reference's activation table (torch_utils/ops/bias_act.py:21-31)
# ---------------------------------------------------------------------------

_ACTS = {
    "linear": (lambda x: x, 1.0),
    "relu": (jax.nn.relu, math.sqrt(2.0)),
    "lrelu": (lambda x: jax.nn.leaky_relu(x, 0.2), math.sqrt(2.0)),
    "tanh": (jnp.tanh, 1.0),
    "sigmoid": (jax.nn.sigmoid, 1.0),
    "elu": (jax.nn.elu, 1.0),
    "selu": (jax.nn.selu, 1.0),
    "softplus": (jax.nn.softplus, 1.0),
    "swish": (jax.nn.swish, math.sqrt(2.0)),
}


def bias_act(x, b=None, *, dim: int = 1, act: str = "linear", alpha=None, gain=None,
             clamp=None):
    """Fused bias + activation + gain + clamp. XLA fuses the chain into one
    elementwise kernel; provided for API parity with the CUDA plugin."""
    fn, def_gain = _ACTS[act]
    gain = def_gain if gain is None else gain
    if b is not None:
        shape = [1] * x.ndim
        shape[dim] = -1
        x = x + b.reshape(shape)
    if act == "lrelu" and alpha is not None:
        x = jax.nn.leaky_relu(x, alpha)
    else:
        x = fn(x)
    if gain != 1.0:
        x = x * gain
    if clamp is not None and clamp >= 0:
        x = jnp.clip(x, -clamp, clamp)
    return x


# ---------------------------------------------------------------------------
# upfirdn2d: upsample -> FIR filter -> downsample (NCHW like the reference)
# ---------------------------------------------------------------------------

def setup_filter(f, normalize: bool = True, gain: float = 1.0, separable=None):
    """Prepare a 2D FIR filter from a 1D/2D tap list
    (torch_utils/ops/upfirdn2d.py setup_filter semantics)."""
    f = jnp.asarray(f, dtype=jnp.float32)
    if f.ndim == 0:
        f = f[None]
    if f.ndim == 1:
        f = jnp.outer(f, f)
    if normalize:
        f = f / jnp.sum(f)
    return f * gain


def upfirdn2d(x, f, up: int = 1, down: int = 1, padding=0, gain: float = 1.0):
    """x: [N, C, H, W]. Zero-stuff by ``up``, pad, convolve with FIR ``f``,
    subsample by ``down`` -- expressed exactly as one
    ``conv_general_dilated`` with lhs dilation (up) and window stride (down).
    """
    if isinstance(padding, int):
        padding = (padding, padding, padding, padding)
    px0, px1, py0, py1 = padding
    n, c, h, w = x.shape
    f = jnp.asarray(f, dtype=x.dtype)
    fh, fw = f.shape
    # flip: upfirdn correlates with the flipped filter (true convolution)
    kern = jnp.tile(f[::-1, ::-1][None, None], (c, 1, 1, 1))  # [C,1,fh,fw] depthwise
    # lhs_dilation produces (n-1)*up+1 samples; zero-stuffed upfirdn has n*up,
    # so add the missing (up-1) trailing zeros as extra padding
    y = jax.lax.conv_general_dilated(
        x, kern,
        window_strides=(down, down),
        padding=((py0, py1 + up - 1), (px0, px1 + up - 1)),
        lhs_dilation=(up, up),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=c,
    )
    return y * gain if gain != 1.0 else y


def upsample2d(x, f, up: int = 2, gain: float = 1.0):
    fh = f.shape[-1]
    return upfirdn2d(
        x, f, up=up,
        padding=((fh + up - 1) // 2, (fh - up) // 2, (fh + up - 1) // 2, (fh - up) // 2),
        gain=gain * up * up,
    )


def downsample2d(x, f, down: int = 2, gain: float = 1.0):
    fh = f.shape[-1]
    return upfirdn2d(
        x, f, down=down,
        padding=((fh - down + 1) // 2, (fh - down) // 2, (fh - down + 1) // 2, (fh - down) // 2),
        gain=gain,
    )


def filtered_lrelu(x, fu=None, fd=None, b=None, *, up: int = 2, down: int = 2,
                   padding=0, gain: float = math.sqrt(2.0), slope: float = 0.2,
                   clamp=None):
    """StyleGAN3 filtered leaky-ReLU: upsample -> bias -> lrelu (+gain/clamp)
    -> downsample (torch_utils/ops/filtered_lrelu.py:41+), composed from
    :func:`upfirdn2d` + :func:`bias_act` -- XLA fuses the elementwise middle.
    """
    if fu is None:
        fu = jnp.ones((1, 1), dtype=x.dtype)
    if fd is None:
        fd = jnp.ones((1, 1), dtype=x.dtype)
    if isinstance(padding, int):
        padding = (padding, padding, padding, padding)
    x = upfirdn2d(x, fu, up=up, padding=padding, gain=float(up * up))
    x = bias_act(x, b, dim=1, act="lrelu", alpha=slope, gain=gain, clamp=clamp)
    x = upfirdn2d(x, fd, down=down)
    return x


# ---------------------------------------------------------------------------
# instant-NGP style multiresolution hash encoding (hash_sample plugin)
# ---------------------------------------------------------------------------

_PRIMES = np.array([1, 2654435761, 805459861], dtype=np.uint32)


def hash_encode(xyz01, table, *, n_levels: int = 16, base_res: int = 16,
                per_level_scale: float = 1.3819129, features_per_level: int = 2):
    """Multi-resolution hash-grid lookup with trilinear interpolation.

    Args:
      xyz01: ``[M, 3]`` coordinates in [0,1].
      table: ``[n_levels, table_size, features_per_level]`` learnable table.

    Returns ``[M, n_levels * features_per_level]``. Fully differentiable wrt
    ``table`` (gather transpose = scatter-add).
    """
    L, T, F = table.shape
    assert L == n_levels and F == features_per_level
    outs = []
    for lvl in range(n_levels):
        res = int(np.floor(base_res * per_level_scale**lvl))
        pos = xyz01 * res
        i0 = jnp.floor(pos).astype(jnp.uint32)
        frac = pos - jnp.floor(pos)
        feat = jnp.zeros((xyz01.shape[0], F), dtype=table.dtype)
        for cx in (0, 1):
            for cy in (0, 1):
                for cz in (0, 1):
                    corner = i0 + jnp.asarray([cx, cy, cz], dtype=jnp.uint32)
                    h = (corner[:, 0] * _PRIMES[0]) ^ (corner[:, 1] * _PRIMES[1]) ^ (
                        corner[:, 2] * _PRIMES[2]
                    )
                    idx = (h % jnp.uint32(T)).astype(jnp.int32)
                    w = jnp.prod(
                        jnp.where(jnp.asarray([cx, cy, cz]) == 1, frac, 1.0 - frac), axis=-1
                    )
                    feat = feat + w[:, None] * jnp.take(table[lvl], idx, axis=0)
        outs.append(feat)
    return jnp.concatenate(outs, axis=-1)


def init_hash_table(key, n_levels: int = 16, log2_table_size: int = 19,
                    features_per_level: int = 2, scale: float = 1e-4):
    return jax.random.uniform(
        key, (n_levels, 2**log2_table_size, features_per_level),
        minval=-scale, maxval=scale,
    )


# ---------------------------------------------------------------------------
# top-p masking (nerf_utils plugin; the reference wrapper's sort/cumsum path)
# ---------------------------------------------------------------------------

def topp_masking(weights, p: float = 0.99):
    """Keep the smallest set of samples per ray whose weights sum to >= p of
    the total; mask the tail (torch_utils/ops/nerf_utils.py:24-38 semantics).

    weights: ``[N, K]``. Returns bool ``[N, K]``.
    """
    order = jnp.argsort(-weights, axis=-1)
    sorted_w = jnp.take_along_axis(weights, order, axis=-1)
    total = jnp.sum(sorted_w, axis=-1, keepdims=True)
    cum = jnp.cumsum(sorted_w, axis=-1)
    keep_sorted = (cum - sorted_w) < p * total  # keep until p mass reached
    inv = jnp.argsort(order, axis=-1)
    return jnp.take_along_axis(keep_sorted, inv, axis=-1)

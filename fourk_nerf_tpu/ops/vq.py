"""EMA vector-quantization codebook (the reference's VQGrid).

Rebuild of /root/reference/lib/grid.py:38-103: a projection MLP maps input
features to the code dimension, the nearest codebook entry is selected, the
codebook is maintained with exponential-moving-average cluster statistics
(Laplace-smoothed), and gradients pass straight-through. Functional: the EMA
buffers are explicit state returned from :func:`vq_forward`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DECAY, EPS = 0.99, 1e-5  # lib/grid.py:39


def init_vq(key, input_dim: int, dim: int, n_embed: int):
    """Returns (params, state): projection MLP params + codebook EMA state."""
    from fourk_nerf_tpu.models import common

    k1, k2 = jax.random.split(key)
    params = {"project": common.mlp_init(k1, [input_dim, dim, dim], zero_final_bias=False)}
    embed = jax.random.normal(k2, (dim, n_embed))
    state = {
        "embed": embed,
        "cluster_size": jnp.zeros((n_embed,)),
        "embed_avg": embed,
    }
    return params, state


def vq_forward(params: dict, state: dict, x, *, training: bool = False):
    """Quantize ``[..., input_dim]`` features.

    Returns (quantized [..., dim], commitment_diff scalar, indices [...],
    new_state). ``new_state`` equals ``state`` when not training.
    """
    from fourk_nerf_tpu.models import common

    v = common.mlp_apply(params["project"], x, jax.nn.relu)
    dim = v.shape[-1]
    flat = v.reshape(-1, dim)
    embed = state["embed"]  # [dim, n_embed]
    dist = (
        jnp.sum(flat**2, axis=1, keepdims=True)
        - 2.0 * flat @ embed
        + jnp.sum(embed**2, axis=0, keepdims=True)
    )
    idx = jnp.argmin(dist, axis=1)
    quantize = jnp.take(embed.T, idx, axis=0).reshape(v.shape)

    new_state = state
    if training:
        n_embed = embed.shape[1]
        onehot = jax.nn.one_hot(idx, n_embed, dtype=flat.dtype)
        cluster_size = state["cluster_size"] * DECAY + (1 - DECAY) * jnp.sum(onehot, axis=0)
        embed_avg = state["embed_avg"] * DECAY + (1 - DECAY) * (flat.T @ onehot)
        n = jnp.sum(cluster_size)
        smoothed = (cluster_size + EPS) / (n + n_embed * EPS) * n
        new_state = {
            "embed": embed_avg / smoothed[None, :],
            "cluster_size": cluster_size,
            "embed_avg": embed_avg,
        }

    diff = jnp.mean((jax.lax.stop_gradient(quantize) - v) ** 2)
    quantize = v + jax.lax.stop_gradient(quantize - v)  # straight-through
    return quantize, diff, idx.reshape(x.shape[:-1]), new_state

"""Encoder-training loss assembly on dense ``[N, K]`` render outputs.

Mirrors the loss terms of the reference training loop
(/root/reference/run.py:522-545): photometric MSE, background entropy,
per-point rgb loss, and the efficient distortion loss. Masked samples carry
weight 0, so the dense sums equal the reference's ragged sums exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fourk_nerf_tpu.ops import render


def photometric_mse(rgb_marched, target):
    return jnp.mean((rgb_marched - target) ** 2)


def entropy_last_loss(alphainv_last):
    """Background entropy (run.py:524-527)."""
    pout = jnp.clip(alphainv_last, 1e-6, 1 - 1e-6)
    return -jnp.mean(pout * jnp.log(pout) + (1 - pout) * jnp.log(1 - pout))


def rgbper(raw_rgb, weights, target, n_rays: int):
    """Per-point color loss, weighted by detached compositing weights
    (run.py:542-545). raw_rgb ``[N,K,3]``, weights ``[N,K]``, target ``[N,3]``."""
    rgbper_term = jnp.sum((raw_rgb - target[:, None, :]) ** 2, axis=-1)
    return jnp.sum(rgbper_term * jax.lax.stop_gradient(weights)) / n_rays


def nearclip_loss(raw_density, t, near_thres: float):
    """Zero-valued gradient penalty pushing near-camera density down
    (run.py:528-534): sum of (density - stop_grad(density)) over samples
    closer than ``near_thres``."""
    mask = t < near_thres
    d = jnp.where(mask, raw_density, 0.0)
    return jnp.sum(d - jax.lax.stop_gradient(d))


def encoder_losses(result: dict, target, cfg_train, n_rays: int, near_thres=None):
    """Total loss + per-term dict for one encoder training step."""
    terms = {}
    loss = cfg_train.weight_main * photometric_mse(result["rgb_marched"], target)
    terms["mse"] = loss
    if cfg_train.weight_entropy_last > 0:
        ent = entropy_last_loss(result["alphainv_last"])
        terms["entropy_last"] = ent
        loss = loss + cfg_train.weight_entropy_last * ent
    if getattr(cfg_train, "weight_nearclip", 0) > 0 and near_thres is not None:
        ncl = nearclip_loss(result["raw_density"], result["t"], near_thres)
        terms["nearclip"] = ncl
        loss = loss + cfg_train.weight_nearclip * ncl
    if cfg_train.weight_distortion > 0:
        ld = render.distortion_loss(
            result["weights"], result["s"], 1.0 / result["n_max"], n_rays
        )
        terms["distortion"] = ld
        loss = loss + cfg_train.weight_distortion * ld
    if cfg_train.weight_rgbper > 0:
        lr_ = rgbper(result["raw_rgb"], result["weights"], target, n_rays)
        terms["rgbper"] = lr_
        loss = loss + cfg_train.weight_rgbper * lr_
    terms["total"] = loss
    return loss, terms

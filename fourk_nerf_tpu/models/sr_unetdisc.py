"""U-Net discriminators with spectral normalization (Flax).

Rebuild of /root/reference/lib/sr_unetdisc.py: a 3-down/3-up U-Net with skip
connections, every inner conv spectrally normalized. Spectral norm keeps the
power-iteration vector ``u`` in a mutable ``spectral`` variable collection;
one iteration runs per training forward (torch ``nn.utils.spectral_norm``
semantics).

The input is bilinearly resized to a multiple of 8 (reference :33) -- under
jit the patch sizes are static so this is a fixed resize.

The pose-/viewdir-conditioned variants (reference :65-196) project the
condition and fuse it with a StyleGAN-style dot-product epilogue
(MinibatchStdLayer + conv + dense, /root/reference/lib/utils.py:348-433).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def _lrelu(x):
    return nn.leaky_relu(x, negative_slope=0.2)


class SNConv(nn.Module):
    """Conv2d wrapped in spectral normalization (one power iteration per
    training call, torch-compatible)."""

    features: int
    kernel_size: tuple
    strides: tuple = (1, 1)
    padding: Any = "SAME"
    use_bias: bool = False

    @nn.compact
    def __call__(self, x, update_sn: bool = True):
        kh, kw = self.kernel_size
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (kh, kw, in_ch, self.features)
        )
        # torch reshapes OIHW to (out, in*kh*kw); our HWIO transposes to match
        w_mat = kernel.transpose(3, 0, 1, 2).reshape(self.features, -1)
        u = self.variable(
            "spectral", "u",
            lambda: jax.random.normal(self.make_rng("params") if self.has_rng("params")
                                      else jax.random.PRNGKey(0), (self.features,)),
        )

        def l2n(v):
            return v / (jnp.linalg.norm(v) + 1e-12)

        u_val = u.value
        v_val = l2n(w_mat.T @ u_val)
        u_new = l2n(w_mat @ v_val)
        sigma = u_new @ w_mat @ v_val
        if update_sn and not self.is_initializing():
            u.value = jax.lax.stop_gradient(u_new)
        kernel_sn = kernel / jax.lax.stop_gradient(sigma)
        y = jax.lax.conv_general_dilated(
            x, kernel_sn, window_strides=self.strides,
            padding=self.padding if isinstance(self.padding, str) else self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


def _resize_bilinear(x, h, w):
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[-1]), method="bilinear")


class UNetDiscriminatorSN(nn.Module):
    """Plain U-Net discriminator (reference lib/sr_unetdisc.py:7-62)."""

    num_feat: int = 64
    skip_connection: bool = True

    @nn.compact
    def __call__(self, x, update_sn: bool = True):
        h8, w8 = x.shape[1] // 8 * 8, x.shape[2] // 8 * 8
        if (h8, w8) != x.shape[1:3]:
            x = _resize_bilinear(x, h8, w8)
        nf = self.num_feat
        x0 = _lrelu(nn.Conv(nf, (3, 3), name="conv0")(x))
        x1 = _lrelu(SNConv(nf * 2, (4, 4), (2, 2), padding=((1, 1), (1, 1)), name="conv1")(x0, update_sn))
        x2 = _lrelu(SNConv(nf * 4, (4, 4), (2, 2), padding=((1, 1), (1, 1)), name="conv2")(x1, update_sn))
        x3 = _lrelu(SNConv(nf * 8, (4, 4), (2, 2), padding=((1, 1), (1, 1)), name="conv3")(x2, update_sn))

        x3 = _resize_bilinear(x3, x3.shape[1] * 2, x3.shape[2] * 2)
        x4 = _lrelu(SNConv(nf * 4, (3, 3), name="conv4")(x3, update_sn))
        if self.skip_connection:
            x4 = x4 + x2
        x4 = _resize_bilinear(x4, x4.shape[1] * 2, x4.shape[2] * 2)
        x5 = _lrelu(SNConv(nf * 2, (3, 3), name="conv5")(x4, update_sn))
        if self.skip_connection:
            x5 = x5 + x1
        x5 = _resize_bilinear(x5, x5.shape[1] * 2, x5.shape[2] * 2)
        x6 = _lrelu(SNConv(nf, (3, 3), name="conv6")(x5, update_sn))
        if self.skip_connection:
            x6 = x6 + x0

        out = _lrelu(SNConv(nf, (3, 3), name="conv7")(x6, update_sn))
        out = _lrelu(SNConv(nf, (3, 3), name="conv8")(out, update_sn))
        return nn.Conv(1, (3, 3), name="conv9")(out)


class MinibatchStdLayer(nn.Module):
    """Append per-group feature stddev as an extra channel
    (reference lib/utils.py:348-369)."""

    group_size: int = 4
    num_channels: int = 1

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        g = min(self.group_size, n) if self.group_size is not None else n
        f = self.num_channels
        y = x.reshape(g, -1, h, w, f, c // f)
        y = y - y.mean(axis=0)
        y = jnp.sqrt(jnp.mean(y**2, axis=0) + 1e-8)
        y = y.mean(axis=(1, 2, 4))  # [F]-ish per group; broadcast back
        y = y.reshape(-1, 1, 1, f)
        y = jnp.tile(y, (g, h, w, 1))
        return jnp.concatenate([x, y], axis=-1)


class DiscriminatorEpilogue(nn.Module):
    """StyleGAN2-style epilogue: mbstd -> conv -> dense -> cmap dot product
    (reference lib/utils.py:372-433)."""

    in_channels: int
    cmap_dim: int
    mbstd_group_size: int = 4

    @nn.compact
    def __call__(self, x, cmap):
        x = MinibatchStdLayer(group_size=self.mbstd_group_size)(x)
        x = _lrelu(nn.Conv(self.in_channels, (3, 3), name="conv")(x))
        x = x.reshape(x.shape[0], -1)
        x = _lrelu(nn.Dense(self.in_channels, name="fc")(x))
        x = nn.Dense(self.cmap_dim, name="out")(x)
        # conditioning via projection (StyleGAN cGAN)
        cmap = cmap.reshape(cmap.shape[0], -1)
        return jnp.sum(x * cmap, axis=-1, keepdims=True) * (1.0 / jnp.sqrt(self.cmap_dim))


def _normalize_2nd_moment(x, axis=-1, eps=1e-8):
    return x * jax.lax.rsqrt(jnp.mean(x**2, axis=axis, keepdims=True) + eps)


class UNetDiscriminatorSNPose(nn.Module):
    """Pose-conditioned variant: flattened 3x3 w2c rotation -> cmap, fused by
    the epilogue (reference lib/sr_unetdisc.py:65-129)."""

    num_feat: int = 64
    cmap_dim: int = 32
    skip_connection: bool = True

    @nn.compact
    def __call__(self, x, pose_flat, update_sn: bool = True):
        trunk = UNetDiscriminatorSN(self.num_feat, self.skip_connection, name="trunk")
        # reuse the trunk up to conv8 by re-implementing its tail here would
        # duplicate code; instead run the full trunk minus conv9 via a flag is
        # overkill -- the trunk's conv9 output is unused, we take features.
        feats = _TrunkFeatures(self.num_feat, self.skip_connection, name="feat")(x, update_sn)
        cmap = nn.Dense(self.cmap_dim, name="mapping")(pose_flat)
        cmap = _normalize_2nd_moment(cmap)
        return DiscriminatorEpilogue(self.num_feat, self.cmap_dim, name="epilogue")(feats, cmap)


class UNetDiscriminatorSNViewdir(nn.Module):
    """Viewdir-PE-conditioned variant (reference lib/sr_unetdisc.py:132-196)."""

    num_feat: int = 64
    cmap_dim: int = 64
    skip_connection: bool = True

    @nn.compact
    def __call__(self, x, viewdir_cond, update_sn: bool = True):
        feats = _TrunkFeatures(self.num_feat, self.skip_connection, name="feat")(x, update_sn)
        cmap = nn.Conv(self.cmap_dim, (1, 1), name="mapping")(viewdir_cond)
        cmap = _normalize_2nd_moment(cmap, axis=-1)
        cmap = cmap.mean(axis=(1, 2))
        return DiscriminatorEpilogue(self.num_feat, self.cmap_dim, name="epilogue")(feats, cmap)


class _TrunkFeatures(nn.Module):
    """The shared U-Net trunk, returning pre-head features."""

    num_feat: int = 64
    skip_connection: bool = True

    @nn.compact
    def __call__(self, x, update_sn: bool = True):
        h8, w8 = x.shape[1] // 8 * 8, x.shape[2] // 8 * 8
        if (h8, w8) != x.shape[1:3]:
            x = _resize_bilinear(x, h8, w8)
        nf = self.num_feat
        x0 = _lrelu(nn.Conv(nf, (3, 3), name="conv0")(x))
        x1 = _lrelu(SNConv(nf * 2, (4, 4), (2, 2), padding=((1, 1), (1, 1)), name="conv1")(x0, update_sn))
        x2 = _lrelu(SNConv(nf * 4, (4, 4), (2, 2), padding=((1, 1), (1, 1)), name="conv2")(x1, update_sn))
        x3 = _lrelu(SNConv(nf * 8, (4, 4), (2, 2), padding=((1, 1), (1, 1)), name="conv3")(x2, update_sn))
        x3 = _resize_bilinear(x3, x3.shape[1] * 2, x3.shape[2] * 2)
        x4 = _lrelu(SNConv(nf * 4, (3, 3), name="conv4")(x3, update_sn))
        if self.skip_connection:
            x4 = x4 + x2
        x4 = _resize_bilinear(x4, x4.shape[1] * 2, x4.shape[2] * 2)
        x5 = _lrelu(SNConv(nf * 2, (3, 3), name="conv5")(x4, update_sn))
        if self.skip_connection:
            x5 = x5 + x1
        x5 = _resize_bilinear(x5, x5.shape[1] * 2, x5.shape[2] * 2)
        x6 = _lrelu(SNConv(nf, (3, 3), name="conv6")(x5, update_sn))
        if self.skip_connection:
            x6 = x6 + x0
        out = _lrelu(SNConv(nf, (3, 3), name="conv7")(x6, update_sn))
        return _lrelu(SNConv(nf, (3, 3), name="conv8")(out, update_sn))

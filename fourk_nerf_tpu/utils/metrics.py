"""Evaluation metrics: PSNR, SSIM, LPIPS hook.

PSNR/SSIM match the reference oracles (/root/reference/lib/utils.py:18,88-134;
the SSIM is the mipnerf-style gaussian-window variant). LPIPS is exposed as a
host-side hook: if the ``lpips`` torch package is importable it is used
(CPU), otherwise evaluation proceeds without it.
"""

from __future__ import annotations

import numpy as np


def mse2psnr(mse: float) -> float:
    return float(-10.0 * np.log10(mse))


def psnr(img, gt) -> float:
    return mse2psnr(float(np.mean(np.square(np.asarray(img) - np.asarray(gt)))))


def to8b(x) -> np.ndarray:
    return (255 * np.clip(np.asarray(x), 0, 1)).astype(np.uint8)


def rgb_ssim(img0, img1, max_val=1.0, filter_size=11, filter_sigma=1.5, k1=0.01, k2=0.03,
             return_map=False):
    """Gaussian-window SSIM on HxWx3 float images (reference lib/utils.py:88-134)."""
    img0 = np.asarray(img0, dtype=np.float64)
    img1 = np.asarray(img1, dtype=np.float64)
    assert img0.ndim == 3 and img0.shape[-1] == 3 and img0.shape == img1.shape

    hw = filter_size // 2
    shift = (2 * hw - filter_size + 1) / 2
    f_i = ((np.arange(filter_size) - hw + shift) / filter_sigma) ** 2
    filt = np.exp(-0.5 * f_i)
    filt /= np.sum(filt)

    def convolve_valid(z, f):
        # separable 'valid' convolution along both spatial axes
        from scipy.signal import convolve2d

        return convolve2d(convolve2d(z, f[:, None], mode="valid"), f[None, :], mode="valid")

    def filt_fn(z):
        return np.stack([convolve_valid(z[..., i], filt) for i in range(z.shape[-1])], -1)

    mu0 = filt_fn(img0)
    mu1 = filt_fn(img1)
    mu00, mu11, mu01 = mu0 * mu0, mu1 * mu1, mu0 * mu1
    sigma00 = np.maximum(0.0, filt_fn(img0**2) - mu00)
    sigma11 = np.maximum(0.0, filt_fn(img1**2) - mu11)
    sigma01 = filt_fn(img0 * img1) - mu01
    sigma01 = np.sign(sigma01) * np.minimum(np.sqrt(sigma00 * sigma11), np.abs(sigma01))
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    numer = (2 * mu01 + c1) * (2 * sigma01 + c2)
    denom = (mu00 + mu11 + c1) * (sigma00 + sigma11 + c2)
    ssim_map = numer / denom
    return ssim_map if return_map else float(np.mean(ssim_map))


def visualize_depth(depth, minmax=None):
    """Depth map -> JET-colormapped uint8 image (reference lib/utils.py:68-83)."""
    import cv2

    x = np.nan_to_num(np.asarray(depth))
    if minmax is None:
        positive = x[x > 0]
        mi = positive.min() if positive.size else 0.0
        ma = x.max()
    else:
        mi, ma = minmax
    x = (x - mi) / (ma - mi + 1e-8)
    x = (255 * np.clip(x, 0, 1)).astype(np.uint8)
    return cv2.applyColorMap(x, cv2.COLORMAP_JET)


_LPIPS_PROXY_FILTERS: dict = {}


def _lpips_proxy_filters(n_feats: int, seed: int) -> np.ndarray:
    key = (n_feats, seed)
    if key not in _LPIPS_PROXY_FILTERS:
        rng = np.random.default_rng(seed)
        f = rng.normal(size=(3, 3, 3, n_feats)).astype(np.float32)
        f -= f.mean(axis=(0, 1), keepdims=True)  # zero-mean: edge-sensitive
        f /= np.sqrt(np.sum(f * f, axis=(0, 1, 2), keepdims=True))
        _LPIPS_PROXY_FILTERS[key] = f
    return _LPIPS_PROXY_FILTERS[key]


def _random_feats(img: np.ndarray, filters: np.ndarray) -> np.ndarray:
    """'valid' 3x3 conv + relu + per-pixel unit normalization over channels."""
    win = np.lib.stride_tricks.sliding_window_view(img, (3, 3), axis=(0, 1))
    # win: [H-2, W-2, 3(ch), 3, 3]; filters: [3, 3, 3(ch), C]
    feat = np.einsum("hwcij,ijcf->hwf", win, filters, optimize=True)
    feat = np.maximum(feat, 0.0)
    return feat / (np.linalg.norm(feat, axis=-1, keepdims=True) + 1e-8)


def rgb_lpips_proxy(gt, im, n_scales: int = 3, n_feats: int = 24,
                    seed: int = 0) -> float:
    """Deterministic LPIPS-style perceptual distance from a FIXED-SEED
    random-feature pyramid (per scale: random 3x3 conv -> relu -> unit
    normalization -> squared difference, averaged over space and summed over
    scales -- the LPIPS recipe with a random tower in place of a pretrained
    one; random convnet features are a known perceptual-metric baseline).

    NOT the published LPIPS metric: absolute values are not comparable to
    ``lpips``. It exists so LPIPS-gated best-checkpoint selection
    (/root/reference/run_sr.py:1150-1156) can exercise the same *mechanism*
    when the torch ``lpips`` package is absent (zero-egress images)."""
    a = np.asarray(gt, dtype=np.float32)
    b = np.asarray(im, dtype=np.float32)
    assert a.shape == b.shape and a.ndim == 3 and a.shape[-1] == 3
    total = 0.0
    for s in range(n_scales):
        if min(a.shape[0], a.shape[1]) < 3:
            break
        filters = _lpips_proxy_filters(n_feats, seed + s)
        fa, fb = _random_feats(a, filters), _random_feats(b, filters)
        total += float(np.mean(np.sum((fa - fb) ** 2, axis=-1)))
        if s + 1 < n_scales:
            ha, wa = (a.shape[0] // 2) * 2, (a.shape[1] // 2) * 2
            a = a[:ha, :wa].reshape(ha // 2, 2, wa // 2, 2, 3).mean(axis=(1, 3))
            b = b[:ha, :wa].reshape(ha // 2, 2, wa // 2, 2, 3).mean(axis=(1, 3))
    return total


_LPIPS_CACHE: dict = {}


def rgb_lpips(gt, im, net_name: str = "vgg") -> float | None:
    """LPIPS via the torch ``lpips`` package on CPU; None if unavailable
    (reference lib/utils.py:137-149)."""
    try:
        import lpips  # type: ignore
        import torch
    except ImportError:
        return None
    if net_name not in _LPIPS_CACHE:
        _LPIPS_CACHE[net_name] = lpips.LPIPS(net=net_name, version="0.1").eval()
    model = _LPIPS_CACHE[net_name]
    gt_t = torch.from_numpy(np.asarray(gt, dtype=np.float32)).permute(2, 0, 1)
    im_t = torch.from_numpy(np.asarray(im, dtype=np.float32)).permute(2, 0, 1)
    with torch.no_grad():
        return float(model(gt_t, im_t, normalize=True).item())

"""Image quality metrics, pure JAX (reference utils/metric_util.py).

SSIM here is a self-contained JAX implementation replacing the reference's
kornia dependency (reference utils/metric_util.py:19-24: window=3,
returned as 1 - 2*dssim in [-1, 1] — we also expose the standard ssim value).
"""
from __future__ import annotations

import jax.numpy as jnp


def mse(image_pred, image_gt, valid_mask=None, reduction="mean"):
    value = (image_pred - image_gt) ** 2
    if valid_mask is not None:
        value = jnp.where(valid_mask, value, 0.0)
        if reduction == "mean":
            n = jnp.sum(valid_mask) * (value.size // valid_mask.size)
            return jnp.sum(value) / jnp.maximum(n, 1)
        return value
    if reduction == "mean":
        return jnp.mean(value)
    return value


def psnr(image_pred, image_gt, valid_mask=None, reduction="mean"):
    """-10 log10(mse) (reference utils/metric_util.py:15-16)."""
    return -10.0 * jnp.log10(mse(image_pred, image_gt, valid_mask, reduction))


def gaussian_kernel1d(win: int, sigma: float):
    """Normalized 1D gaussian taps, kornia's window
    (kornia.filters.get_gaussian_kernel1d; sigma=1.5 inside
    kornia.losses.ssim, the reference's metric backend
    utils/metric_util.py:19-24)."""
    x = jnp.arange(win, dtype=jnp.float32) - (win - 1) / 2.0
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def _window_filter_valid(x, kernel):
    """Separable filter with 1D taps `kernel` over the last two dims,
    'valid' padding. x: (C, H, W)."""
    win = kernel.shape[0]
    h_out = x.shape[1] - win + 1
    x = sum(kernel[i] * x[:, i:i + h_out, :] for i in range(win))
    w_out = x.shape[2] - win + 1
    x = sum(kernel[i] * x[:, :, i:i + w_out] for i in range(win))
    return x


def ssim(image_pred, image_gt, win: int = 3, max_val: float = 1.0,
         reduction: str = "mean", sigma: float = 1.5):
    """Standard SSIM with a gaussian window (sigma=1.5, kornia's choice —
    the reference's backend, utils/metric_util.py:19-24), 'valid' padding.
    Pass ``sigma=None`` for a box window. Expects channel-first (C, H, W)
    in [0, max_val]."""
    C1 = (0.01 * max_val) ** 2
    C2 = (0.03 * max_val) ** 2

    if sigma is None:
        kernel = jnp.full((win,), 1.0 / win, jnp.float32)
    else:
        kernel = gaussian_kernel1d(win, sigma)

    def _filt(x):
        return _window_filter_valid(x, kernel)

    mu_x = _filt(image_pred)
    mu_y = _filt(image_gt)
    mu_xx = _filt(image_pred * image_pred)
    mu_yy = _filt(image_gt * image_gt)
    mu_xy = _filt(image_pred * image_gt)

    sigma_x = mu_xx - mu_x**2
    sigma_y = mu_yy - mu_y**2
    sigma_xy = mu_xy - mu_x * mu_y

    num = (2 * mu_x * mu_y + C1) * (2 * sigma_xy + C2)
    den = (mu_x**2 + mu_y**2 + C1) * (sigma_x + sigma_y + C2)
    ssim_map = num / den
    if reduction == "mean":
        return jnp.mean(ssim_map)
    return ssim_map

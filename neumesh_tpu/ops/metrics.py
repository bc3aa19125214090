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


def _avg_pool_same(x, win: int):
    """Mean filter with window `win` over the last two dims, 'valid' padding.
    x: (C, H, W)."""
    c, h, w = x.shape
    # separable box filter via cumsum
    pad = jnp.zeros((c, 1, w), dtype=x.dtype)
    cs = jnp.cumsum(jnp.concatenate([pad, x], axis=1), axis=1)
    x = (cs[:, win:, :] - cs[:, :-win, :]) / win
    h2 = x.shape[1]
    pad = jnp.zeros((c, h2, 1), dtype=x.dtype)
    cs = jnp.cumsum(jnp.concatenate([pad, x], axis=2), axis=2)
    x = (cs[:, :, win:] - cs[:, :, :-win]) / win
    return x


def ssim(image_pred, image_gt, win: int = 3, max_val: float = 1.0,
         reduction: str = "mean"):
    """Standard SSIM with a box window (kornia uses gaussian; box window with
    the same small support is within noise for win=3). Inputs (C, H, W) or
    (H, W, C)-like: expects channel-first (C, H, W) in [0, max_val]."""
    C1 = (0.01 * max_val) ** 2
    C2 = (0.03 * max_val) ** 2

    mu_x = _avg_pool_same(image_pred, win)
    mu_y = _avg_pool_same(image_gt, win)
    mu_xx = _avg_pool_same(image_pred * image_pred, win)
    mu_yy = _avg_pool_same(image_gt * image_gt, win)
    mu_xy = _avg_pool_same(image_pred * image_gt, win)

    sigma_x = mu_xx - mu_x**2
    sigma_y = mu_yy - mu_y**2
    sigma_xy = mu_xy - mu_x * mu_y

    num = (2 * mu_x * mu_y + C1) * (2 * sigma_xy + C2)
    den = (mu_x**2 + mu_y**2 + C1) * (sigma_x + sigma_y + C2)
    ssim_map = num / den
    if reduction == "mean":
        return jnp.mean(ssim_map)
    return ssim_map

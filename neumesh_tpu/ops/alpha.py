"""NeuS opacity/transmittance math (reference models/renderer.py:13-63).

Pure elementwise/scan ops; fuse cleanly into the volume-render program.
Epsilon placement matches the reference exactly (PSNR-parity requirement).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cdf_Phi_s(x, s):
    """NeuS CDF: sigmoid(s * x) (reference models/renderer.py:13-14)."""
    return jax.nn.sigmoid(x * s)


def sdf_to_alpha(sdf, s):
    """sdf: (..., N_pts) -> (cdf (..., N_pts), alpha (..., N_pts - 1)).
    alpha_i = clamp((Phi_i - Phi_{i+1}) / (Phi_i + 1e-10), min=0)
    (reference models/renderer.py:17-24)."""
    cdf = cdf_Phi_s(sdf, s)
    alpha = (cdf[..., :-1] - cdf[..., 1:]) / (cdf[..., :-1] + 1e-10)
    alpha = jnp.clip(alpha, min=0.0)
    return cdf, alpha


def alpha_to_w(alpha):
    """alpha (..., N) -> visibility weights (..., N):
    w_i = alpha_i * prod_{j<i}(1 - alpha_j + 1e-10)
    (reference models/renderer.py:49-63)."""
    shifted_transparency = jnp.concatenate(
        [jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], axis=-1
    )
    return alpha * jnp.cumprod(shifted_transparency, axis=-1)[..., :-1]


def sdf_to_w(sdf, s):
    """(cdf, alpha, w) in one call (reference models/renderer.py:27-46)."""
    cdf, alpha = sdf_to_alpha(sdf, s)
    return cdf, alpha, alpha_to_w(alpha)

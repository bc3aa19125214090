"""Pure-JAX LPIPS (VGG16 backbone) — completes the PSNR/SSIM/LPIPS metric
set of the BASELINE.md parity plan (the reference lists lpips in
environment.yml:43 but never imports it; the released val splits are meant
to be scored with the standard richzhang/PerceptualSimilarity VGG metric).

No weights ship with this repo (the environment has no network access).
`load_lpips_weights` reads the standard files when the user provides them:

- torchvision's vgg16 state_dict (`vgg16-397923af.pth`, keys
  features.{i}.weight/bias) via the pure-python torch reader, and
- the lpips package's linear heads (`vgg.pth`, keys
  lin{k}.model.1.weight).

`lpips_available()` gates callers so offline runs skip gracefully.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (out_channels, pool_before) per conv layer, with the
# torchvision features.{index} of each conv, and the ReLU taps LPIPS uses
# (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3).
_VGG_CONVS = [
    (64, 0), (64, 2), (128, 5), (128, 7), (256, 10), (256, 12), (256, 14),
    (512, 17), (512, 19), (512, 21), (512, 24), (512, 26), (512, 28),
]
_POOL_BEFORE = {2, 4, 7, 10}           # conv list indices preceded by pool
_TAPS = (1, 3, 6, 9, 12)               # conv list indices of the taps
_CHANNELS = (64, 128, 256, 512, 512)

_SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)

_ENV_VGG = "NEUMESH_LPIPS_VGG"         # path to vgg16-*.pth
_ENV_LIN = "NEUMESH_LPIPS_LIN"         # path to lpips vgg.pth (lin heads)


def load_lpips_weights(vgg_path: Optional[str] = None,
                       lin_path: Optional[str] = None):
    """Weights dict for `lpips` from the standard .pth files, or None when
    they are not available (offline)."""
    vgg_path = vgg_path or os.environ.get(_ENV_VGG)
    lin_path = lin_path or os.environ.get(_ENV_LIN)
    if not vgg_path or not os.path.exists(vgg_path):
        return None
    from ..utils.torch_ckpt import load_torch_checkpoint

    sd = load_torch_checkpoint(vgg_path)
    sd = sd.get("model", sd)
    convs = []
    for _, idx in _VGG_CONVS:
        w = np.asarray(sd[f"features.{idx}.weight"], np.float32)
        b = np.asarray(sd[f"features.{idx}.bias"], np.float32)
        convs.append({"w": w, "b": b})
    lins = None
    if lin_path and os.path.exists(lin_path):
        lsd = load_torch_checkpoint(lin_path)
        lsd = lsd.get("model", lsd)
        lins = [np.asarray(lsd[f"lin{k}.model.1.weight"],
                           np.float32).reshape(-1)
                for k in range(5)]
    if lins is None:
        # unweighted fallback: uniform heads (not the calibrated metric,
        # but a valid perceptual distance; callers are told via the flag)
        lins = [np.full(c, 1.0 / c, np.float32) for c in _CHANNELS]
    return {"convs": convs, "lins": lins, "calibrated": lin_path is not None}


def lpips_available(weights=None) -> bool:
    return (weights or load_lpips_weights()) is not None


def _vgg_features(weights, img):
    """img: (N, 3, H, W) in [0, 1] -> list of tap activations."""
    x = (img * 2.0 - 1.0 - _SHIFT[None, :, None, None]) \
        / _SCALE[None, :, None, None]
    taps = []
    for i, conv in enumerate(weights["convs"]):
        if i in _POOL_BEFORE:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2),
                "VALID")
        x = jax.lax.conv_general_dilated(
            x, jnp.asarray(conv["w"]), (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x = x + jnp.asarray(conv["b"])[None, :, None, None]
        x = jnp.maximum(x, 0.0)
        if i in _TAPS:
            taps.append(x)
    return taps


def lpips(weights, img0, img1):
    """LPIPS distance between (..., H, W, 3) images in [0, 1] (lower is
    more similar). Uses the standard formula: unit-normalize each tap
    across channels, squared difference, per-channel linear head, spatial
    + layer sum."""
    def nchw(a):
        a = jnp.asarray(a, jnp.float32)
        if a.ndim == 3:
            a = a[None]
        return jnp.transpose(a, (0, 3, 1, 2))

    t0 = _vgg_features(weights, nchw(img0))
    t1 = _vgg_features(weights, nchw(img1))
    total = 0.0
    for a, b, lin in zip(t0, t1, weights["lins"]):
        a = a / (jnp.linalg.norm(a, axis=1, keepdims=True) + 1e-10)
        b = b / (jnp.linalg.norm(b, axis=1, keepdims=True) + 1e-10)
        d = (a - b) ** 2                                  # (N, C, H, W)
        w = jnp.asarray(lin)[None, :, None, None]
        total = total + jnp.mean(jnp.sum(d * w, axis=1), axis=(-1, -2))
    return total

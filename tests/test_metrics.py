"""PSNR/SSIM metrics. SSIM ships the reference's gaussian window
(reference utils/metric_util.py:19-24 used kornia ssim, window=3 with a
sigma=1.5 GAUSSIAN window); VERDICT r3 #7 retired the box-window tolerance
footnote — the default is now pinned to <=1e-4 of a hand-computed
gaussian-SSIM golden, with the box window kept as an opt-in (sigma=None)."""
import jax.numpy as jnp
import numpy as np

from neumesh_tpu.ops.metrics import psnr, ssim


def _gaussian_ssim_reference(x, y, win=3, sigma=1.5, max_val=1.0):
    """Gaussian-window SSIM (kornia's formulation), numpy, valid padding.
    x, y: (C, H, W)."""
    ax = np.arange(win) - (win - 1) / 2.0
    g = np.exp(-(ax ** 2) / (2.0 * sigma ** 2))
    k = np.outer(g, g)
    k /= k.sum()

    def filt(im):
        c, h, w = im.shape
        out = np.zeros((c, h - win + 1, w - win + 1), im.dtype)
        for i in range(win):
            for j in range(win):
                out += k[i, j] * im[:, i:h - win + 1 + i,
                                    j:w - win + 1 + j]
        return out

    C1 = (0.01 * max_val) ** 2
    C2 = (0.03 * max_val) ** 2
    mu_x, mu_y = filt(x), filt(y)
    sxx = filt(x * x) - mu_x ** 2
    syy = filt(y * y) - mu_y ** 2
    sxy = filt(x * y) - mu_x * mu_y
    num = (2 * mu_x * mu_y + C1) * (2 * sxy + C2)
    den = (mu_x ** 2 + mu_y ** 2 + C1) * (sxx + syy + C2)
    return float(np.mean(num / den))


def _render_like_pair(seed, h=64, w=64, noise=0.03):
    """Smooth 'render' + noisy 'gt' (the regime the parity tables score)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w),
                         indexing="ij")
    base = np.stack([
        0.5 + 0.4 * np.sin(6 * xx + 2 * yy + rng.uniform(0, 6)),
        0.5 + 0.4 * np.cos(4 * xx - 3 * yy + rng.uniform(0, 6)),
        0.5 + 0.4 * np.sin(3 * xx * yy + rng.uniform(0, 6)),
    ]).astype(np.float32)
    pred = np.clip(base + rng.normal(size=base.shape) * noise, 0, 1)
    return base.astype(np.float32), pred.astype(np.float32)


def test_psnr_matches_definition():
    gt, pred = _render_like_pair(0)
    want = -10 * np.log10(np.mean((pred - gt) ** 2))
    np.testing.assert_allclose(float(psnr(jnp.asarray(pred),
                                          jnp.asarray(gt))), want,
                               rtol=1e-5)


def test_ssim_default_matches_gaussian_golden():
    """The shipped default (gaussian window, sigma=1.5) reproduces the
    hand-computed kornia-style gaussian SSIM to <=1e-4 on every regime
    the parity tables score (VERDICT r3 #7 done-criterion)."""
    for seed, noise in [(0, 0.01), (1, 0.03), (2, 0.1), (3, 0.3)]:
        gt, pred = _render_like_pair(seed, noise=noise)
        ours = float(ssim(jnp.asarray(pred), jnp.asarray(gt)))
        ref = _gaussian_ssim_reference(pred, gt)
        assert abs(ours - ref) <= 1e-4, (seed, noise, ours, ref)


def test_ssim_box_window_optin_differs():
    """sigma=None selects the legacy box window; at window=3 it stays
    within a few 1e-3 of the gaussian (quantified in round 3) but is NOT
    the default any more."""
    gt, pred = _render_like_pair(2, noise=0.1)
    box = float(ssim(jnp.asarray(pred), jnp.asarray(gt), sigma=None))
    gauss = _gaussian_ssim_reference(pred, gt)
    assert abs(box - gauss) < 5e-3
    assert box != gauss  # genuinely a different window


def test_ssim_identical_images_is_one():
    gt, _ = _render_like_pair(4)
    assert abs(float(ssim(jnp.asarray(gt), jnp.asarray(gt))) - 1.0) < 1e-6

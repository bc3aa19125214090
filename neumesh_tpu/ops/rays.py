"""Ray generation and along-ray sampling (device-side, JAX).

Replaces reference utils/rend_util.py:97-226 (lift / get_rays /
near_far_from_sphere / sphere intersection) and :276-319 (sample_pdf) with
pure-JAX equivalents. All functions are shape-static and jit/vmap friendly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def lift(x, y, z, intrinsics):
    """Pixel coords -> camera-space points, with skew support
    (reference utils/rend_util.py:97-120)."""
    fx = intrinsics[..., 0, 0]
    fy = intrinsics[..., 1, 1]
    cx = intrinsics[..., 0, 2]
    cy = intrinsics[..., 1, 2]
    sk = intrinsics[..., 0, 1]

    x_lift = (
        (
            x
            - cx[..., None]
            + cy[..., None] * sk[..., None] / fy[..., None]
            - sk[..., None] * y / fy[..., None]
        )
        / fx[..., None]
        * z
    )
    y_lift = (y - cy[..., None]) / fy[..., None] * z
    return jnp.stack((x_lift, y_lift, z, jnp.ones_like(z)), axis=-1)


def pixel_to_rays(i, j, c2w, intrinsics):
    """Rays through pixel centers (i=x/col, j=y/row). i, j: (..., N).
    c2w: (..., 4, 4), intrinsics: (..., 4, 4). Returns rays_o, rays_d
    (..., N, 3); rays_d normalised in camera space then rotated
    (reference utils/rend_util.py:158-174)."""
    pixel_points_cam = lift(i, j, jnp.ones_like(i), intrinsics)
    rays_d = pixel_points_cam[..., :3]
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    # rotate into world: R @ d
    rays_d = jnp.einsum("...ab,...nb->...na", c2w[..., :3, :3], rays_d,
                        precision="highest")
    cam_loc = c2w[..., :3, 3]
    rays_o = jnp.broadcast_to(cam_loc[..., None, :], rays_d.shape)
    return rays_o, rays_d


def get_rays(c2w, intrinsics, H: int, W: int, N_rays: int = -1, key=None):
    """Generate rays for a (batch of) camera(s).

    If N_rays > 0, sample pixels by independently-uniform H and W indices
    (the reference's "option 2", utils/rend_util.py:147-151); requires `key`.
    Otherwise, all H*W pixels in row-major order.

    Returns (rays_o, rays_d, select_inds) with shapes (..., N, 3) x2, (..., N).
    """
    prefix = c2w.shape[:-2]
    if N_rays > 0:
        N_rays = min(N_rays, H * W)
        kh, kw = jax.random.split(key)
        select_hs = jax.random.randint(kh, (N_rays,), 0, H)
        select_ws = jax.random.randint(kw, (N_rays,), 0, W)
        select_inds = select_hs * W + select_ws
        select_inds = jnp.broadcast_to(select_inds, prefix + (N_rays,))
        i = (select_inds % W).astype(jnp.float32)
        j = (select_inds // W).astype(jnp.float32)
    else:
        select_inds = jnp.arange(H * W)
        select_inds = jnp.broadcast_to(select_inds, prefix + (H * W,))
        i = (select_inds % W).astype(jnp.float32)
        j = (select_inds // W).astype(jnp.float32)

    rays_o, rays_d = pixel_to_rays(i, j, c2w, intrinsics)
    return rays_o, rays_d, select_inds


def near_far_from_sphere(rays_o, rays_d, r: float = 1.0, keepdim: bool = True):
    """Conservative near/far bounds from the object bounding sphere
    (reference utils/rend_util.py:179-199): near = mid - r clamped >= 0,
    far = mid + r clamped >= r."""
    ray_cam_dot = jnp.sum(rays_o * rays_d, axis=-1, keepdims=keepdim)
    mid = -ray_cam_dot
    near = jnp.clip(mid - r, min=0.0)
    far = jnp.clip(mid + r, min=r)
    return near, far


def get_sphere_intersection(rays_o, rays_d, r: float = 1.0):
    """Exact ray-sphere intersection (reference utils/rend_util.py:202-226).
    Returns (near, far, mask_intersect); near/far are 0 where no hit."""
    rayso_norm_square = jnp.sum(rays_o**2, axis=-1, keepdims=True)
    ray_cam_dot = jnp.sum(rays_o * rays_d, axis=-1, keepdims=True)
    under_sqrt = ray_cam_dot**2 + r**2 - rayso_norm_square
    mask_intersect = under_sqrt > 0
    sqrt = jnp.sqrt(jnp.maximum(under_sqrt, 0.0))
    near = jnp.where(mask_intersect, -sqrt - ray_cam_dot, 0.0)
    far = jnp.where(mask_intersect, sqrt - ray_cam_dot, 0.0)
    near = jnp.clip(near, min=0.0)
    far = jnp.clip(far, min=0.0)
    return near, far, mask_intersect


def sample_pdf(bins, weights, N_importance: int, det: bool = False,
               eps: float = 1e-5, key=None):
    """Inverse-CDF hierarchical sampling (reference utils/rend_util.py:276-319).

    bins: (..., n_bins) sorted sample positions; weights: (..., n_bins - 1).
    Returns (..., N_importance) new samples. `det=True` uses
    linspace(0, 1, N) probes; otherwise uniform randoms from `key`.
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, -1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)  # (..., n_bins)

    if det:
        u = jnp.linspace(0.0, 1.0, N_importance)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (N_importance,))
    else:
        u = jax.random.uniform(key, cdf.shape[:-1] + (N_importance,))

    # searchsorted(side='left') per batch row, expressed as a rank count:
    # inds[b, k] = #{ i : cdf[b, i] < u[b, k] }
    inds = jnp.sum(
        (cdf[..., None, :] < u[..., :, None]).astype(jnp.int32), axis=-1
    )
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)

    # bin lookups as one-hot masked reductions: take_along_axis lowers to
    # ~5 GB/s row gathers on TPU, while these are plain VPU fusions over
    # the (..., N, n_bins) compare tensor the rank count already builds
    j = jnp.arange(cdf.shape[-1])
    oh_below = (below[..., None] == j).astype(cdf.dtype)
    oh_above = (above[..., None] == j).astype(cdf.dtype)
    cdf_below = jnp.sum(oh_below * cdf[..., None, :], axis=-1)
    cdf_above = jnp.sum(oh_above * cdf[..., None, :], axis=-1)
    bins_below = jnp.sum(oh_below * bins[..., None, :], axis=-1)
    bins_above = jnp.sum(oh_above * bins[..., None, :], axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < eps, 1.0, denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def sample_cdf(bins, cdf, N_importance: int, det: bool = False,
               eps: float = 1e-5, key=None):
    """Inverse sampling from a PRE-COMPUTED cdf (reference
    utils/rend_util.py:322-357): a leading zero is prepended, then the
    same rank-count + one-hot-reduction inversion as sample_pdf.

    bins: (..., n) sorted positions; cdf: (..., n - 1) cumulative values
    in [0, 1]. Returns (..., N_importance)."""
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)

    if det:
        u = jnp.linspace(0.0, 1.0, N_importance)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (N_importance,))
    else:
        u = jax.random.uniform(key, cdf.shape[:-1] + (N_importance,))

    inds = jnp.sum(
        (cdf[..., None, :] < u[..., :, None]).astype(jnp.int32), axis=-1)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)

    j = jnp.arange(cdf.shape[-1])
    oh_below = (below[..., None] == j).astype(cdf.dtype)
    oh_above = (above[..., None] == j).astype(cdf.dtype)
    cdf_below = jnp.sum(oh_below * cdf[..., None, :], axis=-1)
    cdf_above = jnp.sum(oh_above * cdf[..., None, :], axis=-1)
    bins_below = jnp.sum(oh_below * bins[..., None, :], axis=-1)
    bins_above = jnp.sum(oh_above * bins[..., None, :], axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < eps, 1.0, denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def lin2img(x, H: int, W: int, batched: bool = False, B=None):
    """(..., H*W, C) flat pixels -> channels-first image(s)
    (reference utils/rend_util.py:258-268)."""
    n, c = x.shape[-2], x.shape[-1]
    assert n == H * W or (batched and B is not None)
    if batched:
        if B is None:
            B = x.shape[0]
        else:
            x = x.reshape(B, n // B, c)
        return jnp.transpose(x, (0, 2, 1)).reshape(B, c, H, W)
    return jnp.transpose(x, (1, 0)).reshape(c, H, W)


def block_order_indices(H: int, W: int, block_h: int = 8,
                        block_w: int = 16):
    """(perm, inv_perm) flattened-ray permutations that group pixels into
    block_h x block_w image tiles (row-major within a block, blocks in
    row-major order). Tile-shared candidate caches need COMPACT ray
    bundles: `tile` consecutive scanline rays span a whole image row,
    whose candidate union cannot fit a fixed-size cache, while a pixel
    block covers a narrow frustum. H/W must be multiples of the block."""
    import numpy as np

    assert H % block_h == 0 and W % block_w == 0, (H, W, block_h, block_w)
    idx = np.arange(H * W).reshape(H, W)
    blocks = idx.reshape(H // block_h, block_h, W // block_w, block_w)
    perm = blocks.transpose(0, 2, 1, 3).reshape(-1)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(H * W)
    return perm, inv

import jax
import jax.numpy as jnp
import numpy as np

from neumesh_tpu.ops import rays as R


def make_cam():
    intr = np.eye(4, dtype=np.float32)
    intr[0, 0] = intr[1, 1] = 100.0
    intr[0, 2], intr[1, 2] = 32.0, 24.0
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0.0, 0.0, -2.0]
    return jnp.asarray(c2w), jnp.asarray(intr)


def test_get_rays_center_pixel():
    c2w, intr = make_cam()
    H, W = 48, 64
    rays_o, rays_d, inds = R.get_rays(c2w, intr, H, W)
    assert rays_o.shape == (H * W, 3) and rays_d.shape == (H * W, 3)
    # the principal pixel (cx=32, cy=24) ray should be along camera +z
    pix = 24 * W + 32
    np.testing.assert_allclose(np.asarray(rays_d[pix]), [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(rays_o[pix]), [0, 0, -2], atol=1e-6)


def test_get_rays_project_back():
    """A point along each ray projects to the generating pixel."""
    c2w, intr = make_cam()
    H, W = 16, 20
    rays_o, rays_d, inds = R.get_rays(c2w, intr, H, W)
    t = 3.7
    pts = np.asarray(rays_o + t * rays_d)
    # world -> cam
    Rw = np.asarray(c2w)[:3, :3]
    tw = np.asarray(c2w)[:3, 3]
    cam_pts = (pts - tw) @ Rw  # R^T (p - t)
    K = np.asarray(intr)[:3, :3]
    proj = cam_pts @ K.T
    proj = proj[:, :2] / proj[:, 2:3]
    ii = np.asarray(inds) % W
    jj = np.asarray(inds) // W
    np.testing.assert_allclose(proj[:, 0], ii, atol=1e-3)
    np.testing.assert_allclose(proj[:, 1], jj, atol=1e-3)


def test_get_rays_sampling_bounds():
    c2w, intr = make_cam()
    H, W = 30, 40
    key = jax.random.PRNGKey(0)
    rays_o, rays_d, inds = R.get_rays(c2w, intr, H, W, N_rays=128, key=key)
    assert rays_o.shape == (128, 3)
    assert int(jnp.max(inds)) < H * W and int(jnp.min(inds)) >= 0


def test_near_far_sphere_conservative():
    """Conservative near/far must bracket the exact intersection."""
    key = jax.random.PRNGKey(1)
    o = jnp.array([[0.0, 0.0, -3.0]]).repeat(64, 0)
    d = jax.random.normal(key, (64, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    near, far = R.near_far_from_sphere(o, d, r=1.0)
    enear, efar, hit = R.get_sphere_intersection(o, d, r=1.0)
    hit = np.asarray(hit)[:, 0]
    assert np.all(np.asarray(near)[hit] <= np.asarray(enear)[hit] + 1e-5)
    assert np.all(np.asarray(far)[hit] >= np.asarray(efar)[hit] - 1e-5)


def _sample_pdf_np(bins, weights, N, det, u=None):
    """Straight numpy transcription of the reference formula
    (utils/rend_util.py:276-319) used as a golden reference."""
    weights = weights + 1e-5
    pdf = weights / weights.sum(-1, keepdims=True)
    cdf = np.cumsum(pdf, -1)
    cdf = np.concatenate([np.zeros_like(cdf[..., :1]), cdf], -1)
    if det:
        u = np.broadcast_to(np.linspace(0, 1, N), cdf.shape[:-1] + (N,))
    inds = np.stack([
        np.searchsorted(cdf[i], u[i], side="left")
        for i in range(cdf.shape[0])
    ])
    below = np.maximum(inds - 1, 0)
    above = np.minimum(inds, cdf.shape[-1] - 1)
    cdf_g0 = np.take_along_axis(cdf, below, -1)
    cdf_g1 = np.take_along_axis(cdf, above, -1)
    bins_g0 = np.take_along_axis(bins, below, -1)
    bins_g1 = np.take_along_axis(bins, above, -1)
    denom = cdf_g1 - cdf_g0
    denom[denom < 1e-5] = 1
    t = (u - cdf_g0) / denom
    return bins_g0 + t * (bins_g1 - bins_g0)


def test_sample_pdf_matches_reference(rng):
    bins = np.sort(rng.uniform(0, 4, size=(8, 16)).astype(np.float32), -1)
    weights = rng.uniform(0, 1, size=(8, 15)).astype(np.float32)
    got = R.sample_pdf(jnp.asarray(bins), jnp.asarray(weights), 12, det=True)
    want = _sample_pdf_np(bins, weights, 12, det=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_sample_pdf_concentrates_mass(rng):
    # all the weight in one bin -> samples land in that bin
    bins = jnp.linspace(0, 1, 11)[None].repeat(4, 0)
    weights = jnp.zeros((4, 10)).at[:, 3].set(100.0)
    s = R.sample_pdf(bins, weights, 32, det=True)
    s = np.asarray(s)
    frac_in_bin = np.mean((s >= 0.3) & (s <= 0.4))
    assert frac_in_bin > 0.9


def test_barycentric_reconstructs_point(rng):
    from neumesh_tpu.ops.geo import barycentric_coordinates

    a = rng.normal(size=(20, 3))
    b = rng.normal(size=(20, 3))
    c = rng.normal(size=(20, 3))
    # random points in the triangle plane
    u = rng.uniform(0, 1, (20, 1))
    v = rng.uniform(0, 1, (20, 1)) * (1 - u)
    w = 1 - u - v
    p = u * a + v * b + w * c
    bc = barycentric_coordinates(p, a, b, c)
    np.testing.assert_allclose(bc, np.concatenate([u, v, w], -1), atol=1e-9)
    recon = bc[:, :1] * a + bc[:, 1:2] * b + bc[:, 2:3] * c
    np.testing.assert_allclose(recon, p, atol=1e-9)


def test_sample_cdf_matches_sample_pdf():
    """sample_cdf(bins, cumsum(pdf)) must agree with sample_pdf(bins, w)
    (reference rend_util.py:322-357 vs :276-319)."""
    import numpy as np

    from neumesh_tpu.ops.rays import sample_cdf, sample_pdf

    rng = np.random.default_rng(0)
    bins = jnp.asarray(np.sort(rng.uniform(0, 4, (8, 33)), -1), jnp.float32)
    w = jnp.asarray(rng.uniform(0.1, 1.0, (8, 32)), jnp.float32)
    out_pdf = sample_pdf(bins, w, 16, det=True)
    pdf = (w + 1e-5) / jnp.sum(w + 1e-5, -1, keepdims=True)
    out_cdf = sample_cdf(bins, jnp.cumsum(pdf, -1), 16, det=True)
    np.testing.assert_allclose(np.asarray(out_pdf), np.asarray(out_cdf),
                               atol=1e-5)


def test_lin2img_shapes():
    import numpy as np

    from neumesh_tpu.ops.rays import lin2img

    x = jnp.asarray(np.arange(2 * 12 * 3, dtype=np.float32)
                    .reshape(2, 12, 3))
    img = lin2img(x[0], 3, 4)
    assert img.shape == (3, 3, 4)
    imgs = lin2img(x, 3, 4, batched=True)
    assert imgs.shape == (2, 3, 3, 4)
    np.testing.assert_allclose(np.asarray(imgs[0]), np.asarray(img))

"""Pallas candidate-field kernel vs the XLA reference math (interpret mode
on CPU; compiled-mode parity is exercised on TPU by bench/render)."""
import jax
import jax.numpy as jnp
import numpy as np

from neumesh_tpu.ops.pallas_kernels import candidate_field


def make_inputs(R=4, S=16, C=32, Fg=8, Fc=8, seed=0):
    rng = np.random.default_rng(seed)
    # candidate points on a sphere patch per ray; queries nearby
    pts = rng.normal(size=(R, C, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
    pts *= 0.5
    xyz = (pts[:, :S, :] + rng.normal(size=(R, S, 3)) * 0.02).astype(
        np.float32)
    ind = rng.normal(size=(R, C, 3)).astype(np.float32)
    feat = rng.normal(size=(R, C, Fg + Fc)).astype(np.float32)
    pp = np.sum(pts * pts, -1).astype(np.float32)
    vn = np.sum(pts * ind, -1).astype(np.float32)
    return (jnp.asarray(xyz), jnp.asarray(pts), jnp.asarray(pp),
            jnp.asarray(ind), jnp.asarray(vn), jnp.asarray(feat))


def xla_reference(xyz, pts, pp, ind, vn, feat, w1, k=8):
    xv = jnp.einsum("rsd,rcd->rsc", xyz, pts)
    xx = jnp.sum(xyz * xyz, -1)
    d2 = jnp.maximum(xx[..., None] + pp[:, None, :] - 2 * xv, 0.0)
    neg, _ = jax.lax.top_k(-d2, k)
    thr = -neg[..., -1:]
    mask = d2 <= thr
    d = jnp.sqrt(jnp.maximum(d2, 1e-20))
    w_raw = jnp.where(mask, 1.0 / (d + 1e-7), 0.0)
    W = w_raw / jnp.sum(w_raw, -1, keepdims=True)
    xn = jnp.einsum("rsd,rcd->rsc", xyz, ind)
    term = w1 * (xn - vn[:, None, :]) + d * d2
    inv = 1.0 / (w1 + d)
    ds = jnp.sum(W * term * inv, -1, keepdims=True)

    def h_of_x(x):
        xv = jnp.einsum("rsd,rcd->rsc", x, pts)
        xx = jnp.sum(x * x, -1)
        d2a = jnp.maximum(xx[..., None] + pp[:, None, :] - 2 * xv, 0.0)
        da = jnp.sqrt(jnp.maximum(d2a, 1e-20))
        xna = jnp.einsum("rsd,rcd->rsc", x, ind)
        terma = w1 * (xna - vn[:, None, :]) + da * d2a
        return jnp.sum(W * terma / (w1 + da), -1)

    _, vjp = jax.vjp(h_of_x, xyz)
    (dh,) = vjp(jnp.ones(xyz.shape[:-1]))
    feats = jnp.einsum("rsc,rcf->rsf", W, feat)
    return ds, dh, feats


def _no_tie_rows(inputs, k=8, eps=1e-6):
    """Rows whose k-th/k+1-th neighbour distances are well separated (the
    kernel's threshold loop legitimately differs from top_k on exact ties)."""
    xyz, pts, pp, ind, vn, feat = inputs
    xv = jnp.einsum("rsd,rcd->rsc", xyz, pts)
    xx = jnp.sum(xyz * xyz, -1)
    d2 = np.asarray(jnp.maximum(
        xx[..., None] + pp[:, None, :] - 2 * xv, 0.0))
    srt = np.sort(d2, axis=-1)
    gaps = np.diff(srt[..., :k + 1], axis=-1)
    return (gaps > eps).all(-1)  # (R, S)


def test_candidate_field_matches_xla():
    inputs = make_inputs()
    w1 = 0.12
    ok = _no_tie_rows(inputs)
    assert ok.mean() > 0.9
    ds_p, dh_p, feats_p = candidate_field(*inputs, w1, interpret=True)
    ds_x, dh_x, feats_x = xla_reference(*inputs, w1)

    def cmp(a, b, **kw):
        np.testing.assert_allclose(np.asarray(a)[ok], np.asarray(b)[ok],
                                   **kw)

    cmp(ds_p, ds_x, atol=1e-5, rtol=1e-4)
    cmp(feats_p, feats_x, atol=5e-5, rtol=1e-4)
    cmp(dh_p, dh_x, atol=1e-4, rtol=1e-3)


def test_candidate_field_variants():
    """want_dh/want_feat static variants must return the same ds and omit
    the unrequested outputs."""
    inputs = make_inputs(seed=3)
    w1 = 0.2
    ds_full, dh, feats = candidate_field(*inputs, w1, interpret=True)
    ds_d, dh_none, fg = candidate_field(
        *inputs[:5], inputs[5][..., :8], w1, interpret=True, want_dh=False)
    assert dh_none is None
    np.testing.assert_allclose(np.asarray(ds_d), np.asarray(ds_full),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(fg), np.asarray(feats)[..., :8],
                               atol=1e-6)
    ds_n, dh_n, f_none = candidate_field(
        *inputs, w1, interpret=True, want_feat=False)
    assert f_none is None
    np.testing.assert_allclose(np.asarray(dh_n), np.asarray(dh), atol=1e-6)


def test_candidate_field_ragged_rays():
    """R not divisible by the block size exercises the edge padding."""
    inputs = make_inputs(R=5, S=12, seed=2)
    w1 = 0.15
    ds_p, dh_p, feats_p = candidate_field(*inputs, w1, interpret=True,
                                          rays_per_block=4)
    ds_x, dh_x, feats_x = xla_reference(*inputs, w1)
    ok = _no_tie_rows(inputs)
    np.testing.assert_allclose(np.asarray(ds_p)[ok], np.asarray(ds_x)[ok],
                               atol=1e-5, rtol=1e-4)


def test_candidate_field_with_sentinels():
    """Padded/sentinel candidates (huge coordinates) must never be selected
    and must not produce NaN/inf in any output."""
    xyz, pts, pp, ind, vn, feat = make_inputs(seed=1)
    pts = pts.at[:, -8:, :].set(1e9)
    pp = jnp.sum(pts * pts, -1)
    ind = ind.at[:, -8:, :].set(0.0)
    vn = jnp.sum(pts * ind, -1)
    ds, dh, feats = candidate_field(xyz, pts, pp, ind, vn, feat, 0.12,
                                    interpret=True)
    for arr in (ds, dh, feats):
        assert np.isfinite(np.asarray(arr)).all()
    # compare against XLA reference with the same sentinels
    ds_x, dh_x, feats_x = xla_reference(xyz, pts, pp, ind, vn, feat, 0.12)
    np.testing.assert_allclose(np.asarray(ds), np.asarray(ds_x), atol=1e-5,
                               rtol=1e-4)

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


# ---------------------------------------------------------------------------
# v3 (the PRODUCTION candidate kernel: candidate axis on lanes, packed
# (8, C) geometry rows) — parity vs the same XLA reference (ADVICE r2)
# ---------------------------------------------------------------------------


def _pack_geo(pts, ind, pp, vn):
    return jnp.concatenate(
        [jnp.swapaxes(pts, -1, -2), jnp.swapaxes(ind, -1, -2),
         pp[:, None, :], vn[:, None, :]], axis=1)        # (B, 8, C)


def test_candidate_field_v3_matches_xla():
    from neumesh_tpu.ops.pallas_kernels import candidate_field_v3

    inputs = make_inputs()
    xyz, pts, pp, ind, vn, feat = inputs
    w1 = 0.12
    ok = _no_tie_rows(inputs)
    assert ok.mean() > 0.9
    geo = _pack_geo(pts, ind, pp, vn)
    ds_p, dh_p, feats_p = candidate_field_v3(xyz, geo, feat, w1,
                                             interpret=True)
    ds_x, dh_x, feats_x = xla_reference(*inputs, w1)

    def cmp(a, b, **kw):
        np.testing.assert_allclose(np.asarray(a)[ok], np.asarray(b)[ok],
                                   **kw)

    cmp(ds_p, ds_x, atol=1e-5, rtol=1e-4)
    cmp(feats_p, feats_x, atol=5e-5, rtol=1e-4)
    cmp(dh_p, dh_x, atol=1e-4, rtol=1e-3)


def test_candidate_field_v3_variants_and_ragged():
    """want_dh/want_feat variants agree on ds; S not a sample_block
    multiple exercises the internal sample padding."""
    from neumesh_tpu.ops.pallas_kernels import candidate_field_v3

    inputs = make_inputs(R=3, S=13, seed=5)
    xyz, pts, pp, ind, vn, feat = inputs
    w1 = 0.2
    geo = _pack_geo(pts, ind, pp, vn)
    ds_full, dh, feats = candidate_field_v3(xyz, geo, feat, w1,
                                            interpret=True, sample_block=32)
    ds_d, dh_none, fg = candidate_field_v3(
        xyz, geo, feat[..., :8], w1, interpret=True, sample_block=32,
        want_dh=False)
    assert dh_none is None
    np.testing.assert_allclose(np.asarray(ds_d), np.asarray(ds_full),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(fg), np.asarray(feats)[..., :8],
                               atol=1e-6)
    ds_x, dh_x, feats_x = xla_reference(*inputs, w1)
    ok = _no_tie_rows(inputs)
    np.testing.assert_allclose(np.asarray(ds_full)[ok],
                               np.asarray(ds_x)[ok], atol=1e-5, rtol=1e-4)


def test_candidate_field_v3_sentinels():
    """C gets padded to a 128 multiple internally with (v=0, pp=huge)
    sentinels; explicit huge-coordinate sentinels must also never win."""
    from neumesh_tpu.ops.pallas_kernels import candidate_field_v3

    xyz, pts, pp, ind, vn, feat = make_inputs(seed=1)
    pts = pts.at[:, -8:, :].set(1e9)
    pp = jnp.sum(pts * pts, -1)
    ind = ind.at[:, -8:, :].set(0.0)
    vn = jnp.sum(pts * ind, -1)
    geo = _pack_geo(pts, ind, pp, vn)
    ds, dh, feats = candidate_field_v3(xyz, geo, feat, 0.12, interpret=True)
    for arr in (ds, dh, feats):
        assert np.isfinite(np.asarray(arr)).all()
    ds_x, _, _ = xla_reference(xyz, pts, pp, ind, vn, feat, 0.12)
    np.testing.assert_allclose(np.asarray(ds), np.asarray(ds_x), atol=1e-5,
                               rtol=1e-4)


def test_forward_parity_pallas_no_nablas_input():
    """use_pallas=True + enable_nablas_input=False routes forward() through
    candidate_field_v3 (_fused_density_nabla); it must match the XLA
    ray-context path (ADVICE r2: this route had no coverage)."""
    from neumesh_tpu.dataio.synthetic import sphere_mesh
    from neumesh_tpu.mesh import MeshGrid
    from neumesh_tpu.models.neumesh.model import NeuMesh
    from neumesh_tpu.ops.rays import near_far_from_sphere

    mesh = sphere_mesh(radius=0.5, n_theta=12, n_phi=24)
    rng = np.random.default_rng(11)
    mesh.vertices = mesh.vertices + rng.normal(
        size=mesh.vertices.shape) * 1e-4
    mesh.compute_vertex_normals()
    mg = MeshGrid(mesh, distance_method="grid")

    def build(use_pallas):
        m = NeuMesh(mg, D_density=2, D_color=2, W=32, geometry_dim=4,
                    color_dim=4, multires_view=2, multires_d=4,
                    multires_fg=1, multires_ft=1,
                    enable_nablas_input=False,
                    learn_indicator_weight=True, use_pallas=use_pallas)
        return m, m.init(jax.random.PRNGKey(0))

    n = 16
    o = jnp.tile(jnp.array([[0.0, 0.0, -2.5]]), (n, 1))
    ang = jnp.linspace(-0.12, 0.12, n)
    d = jnp.stack([ang, jnp.zeros(n), jnp.ones(n)], -1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    near, far = near_far_from_sphere(o, d)
    t = jnp.linspace(0.35, 0.65, 6)
    pts = o[:, None, :] + (near * (1 - t) + far * t)[..., None] * d[:, None, :]
    dirs = jnp.broadcast_to(d[:, None, :], pts.shape)

    outs = {}
    for up in (False, True):
        m, params = build(up)
        bound = m.bind_rays(params, o, d, near, far)
        assert bound is not None
        sdf, rgb = bound.forward(params, pts, dirs)
        dens = bound.forward_density_only(params, pts)
        outs[up] = (np.asarray(sdf), np.asarray(rgb), np.asarray(dens))
    np.testing.assert_allclose(outs[True][0], outs[False][0],
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(outs[True][1], outs[False][1],
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(outs[True][2], outs[False][2],
                               atol=2e-5, rtol=1e-4)


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


def test_field_fused_full_group_matches_ungrouped():
    """full_tiles_per_program > 1 batches tiles into one program of the
    final full-field launch (_field_kernel group); rows are independent
    and row-batching a matmul is exact, so (sdf, rgb, nablas) must match
    the group=1 launch."""
    from neumesh_tpu.dataio.synthetic import sphere_mesh
    from neumesh_tpu.mesh import MeshGrid
    from neumesh_tpu.models.neumesh.model import NeuMesh
    from neumesh_tpu.ops.rays import near_far_from_sphere

    mesh = sphere_mesh(radius=0.5, n_theta=12, n_phi=24)
    mesh.compute_vertex_normals()
    mg = MeshGrid(mesh, distance_method="grid")

    n = 32
    o = jnp.tile(jnp.array([[0.0, 0.0, -2.5]]), (n, 1))
    ang = jnp.linspace(-0.12, 0.12, n)
    d = jnp.stack([ang, jnp.zeros(n), jnp.ones(n)], -1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    near, far = near_far_from_sphere(o, d)
    pts = o + 0.5 * (near + far) * d                   # (n, 3)
    outs = {}
    for group in (1, 4):
        m = NeuMesh(mg, D_density=2, D_color=2, W=32, geometry_dim=4,
                    color_dim=4, multires_view=2, multires_d=4,
                    multires_fg=1, multires_ft=1,
                    enable_nablas_input=True,
                    learn_indicator_weight=True, use_pallas=True,
                    full_tiles_per_program=group)
        params = m.init(jax.random.PRNGKey(0))
        bound, _, _ = m.bind_rays_tiled(params, o, d, near, far, tile=8)
        sdf, rgb, nablas = bound.forward_full(
            params, pts[:, None, :], d[:, None, :])
        outs[group] = (np.asarray(sdf), np.asarray(rgb),
                       np.asarray(nablas))
    for a, b in zip(outs[1], outs[4]):
        np.testing.assert_allclose(b, a, atol=1e-6)


def test_forward_parity_pallas_multires_zero():
    """multires=0 disables every positional encoding (reference
    models/base.py get_embedder identity mode). The fused kernels must
    compile and match the XLA path in this configuration — the disabled
    encoding contributes no concatenate operand at all (ADVICE r3:
    0-width operands may be rejected by Mosaic)."""
    from neumesh_tpu.dataio.synthetic import sphere_mesh
    from neumesh_tpu.mesh import MeshGrid
    from neumesh_tpu.models.neumesh.model import NeuMesh
    from neumesh_tpu.ops.rays import near_far_from_sphere

    mesh = sphere_mesh(radius=0.5, n_theta=12, n_phi=24)
    rng = np.random.default_rng(13)
    mesh.vertices = mesh.vertices + rng.normal(
        size=mesh.vertices.shape) * 1e-4
    mesh.compute_vertex_normals()
    mg = MeshGrid(mesh, distance_method="grid")

    def build(use_pallas):
        m = NeuMesh(mg, D_density=2, D_color=2, W=32, geometry_dim=4,
                    color_dim=4, multires_view=0, multires_d=0,
                    multires_fg=0, multires_ft=0,
                    enable_nablas_input=True,
                    learn_indicator_weight=True, use_pallas=use_pallas)
        return m, m.init(jax.random.PRNGKey(0))

    n = 16
    o = jnp.tile(jnp.array([[0.0, 0.0, -2.5]]), (n, 1))
    ang = jnp.linspace(-0.12, 0.12, n)
    d = jnp.stack([ang, jnp.zeros(n), jnp.ones(n)], -1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    near, far = near_far_from_sphere(o, d)
    t = jnp.linspace(0.35, 0.65, 6)
    pts = o[:, None, :] + (near * (1 - t) + far * t)[..., None] * d[:, None, :]
    dirs = jnp.broadcast_to(d[:, None, :], pts.shape)

    outs = {}
    for up in (False, True):
        m, params = build(up)
        bound = m.bind_rays(params, o, d, near, far)
        assert bound is not None
        sdf, rgb = bound.forward(params, pts, dirs)
        dens = bound.forward_density_only(params, pts)
        outs[up] = (np.asarray(sdf), np.asarray(rgb), np.asarray(dens))
    np.testing.assert_allclose(outs[True][0], outs[False][0],
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(outs[True][1], outs[False][1],
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(outs[True][2], outs[False][2],
                               atol=2e-5, rtol=1e-4)

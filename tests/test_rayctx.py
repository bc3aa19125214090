"""Ray-context fast path must agree with the reference per-sample path."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from neumesh_tpu.dataio.synthetic import sphere_mesh
from neumesh_tpu.mesh import MeshGrid
from neumesh_tpu.models.neumesh.model import NeuMesh
from neumesh_tpu.ops.rays import near_far_from_sphere


def _mk(distance_method, enable_nablas=True):
    mesh = sphere_mesh(radius=0.5, n_theta=24, n_phi=48)
    # break the UV-sphere's exact distance ties (kNN tie-breaking between
    # the paths is legitimately arbitrary; real MC meshes have no ties)
    rng = np.random.default_rng(9)
    mesh.vertices = mesh.vertices + rng.normal(size=mesh.vertices.shape) * 1e-4
    mesh.compute_vertex_normals()
    mg = MeshGrid(mesh, distance_method=distance_method)
    model = NeuMesh(mg, D_density=2, D_color=2, W=32, geometry_dim=4,
                    color_dim=4, multires_view=2, multires_d=4,
                    multires_fg=1, multires_ft=1,
                    enable_nablas_input=enable_nablas,
                    learn_indicator_weight=True)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def make_model(enable_nablas=True):
    return _mk("grid", enable_nablas)


def make_models_with_ref(enable_nablas=True):
    """(grid model, exact brute-force twin, shared params). The ctx path is
    compared against the EXACT kNN path; the per-sample grid path is itself
    slightly approximate and is not a valid golden reference."""
    model, params = _mk("grid", enable_nablas)
    ref_model, _ = _mk("brute", enable_nablas)
    return model, ref_model, params


def camera_rays(n=16):
    o = jnp.tile(jnp.array([[0.0, 0.0, -2.5]]), (n, 1))
    ang = jnp.linspace(-0.12, 0.12, n)
    d = jnp.stack([ang, jnp.zeros(n), jnp.ones(n)], -1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def sample_points(o, d, n_samples=12):
    near, far = near_far_from_sphere(o, d)
    # concentrate samples near the front sphere surface: for this camera the
    # r=0.5 surface sits at ~t=0.25 of the [near, far] chord of the unit
    # bounding sphere (deep-interior points have ill-conditioned kNN — both
    # paths are legitimately approximate there)
    t = jnp.linspace(0.2, 0.3, n_samples)
    z = near + (far - near) * t
    return o[:, None, :] + z[..., None] * d[:, None, :], near, far


@pytest.mark.slow
def test_ctx_density_matches_reference_path():
    model, ref_model, params = make_models_with_ref()
    o, d = camera_rays()
    pts, near, far = sample_points(o, d)
    bound = model.bind_rays(params, o, d, near, far)
    assert bound is not None

    dens_ref = np.asarray(ref_model.forward_density_only(params, pts))
    dens_ctx = np.asarray(bound.forward_density_only(params, pts))
    np.testing.assert_allclose(dens_ctx, dens_ref, atol=8e-4, rtol=2e-3)


def test_ctx_distance_matches_reference_path():
    model, ref_model, params = make_models_with_ref()
    o, d = camera_rays()
    pts, near, far = sample_points(o, d)
    bound = model.bind_rays(params, o, d, near, far)

    ds_ref, _, _ = ref_model.compute_distance(params, pts)
    ds_ctx, _, _ = bound.compute_distance(params, pts)
    np.testing.assert_allclose(np.asarray(ds_ctx), np.asarray(ds_ref),
                               atol=8e-4, rtol=2e-3)


def test_ctx_forward_matches_reference_path():
    model, ref_model, params = make_models_with_ref()
    o, d = camera_rays()
    pts, near, far = sample_points(o, d)
    dirs = jnp.broadcast_to(d[:, None, :], pts.shape)
    bound = model.bind_rays(params, o, d, near, far)

    sdf_ref, rgb_ref = ref_model.forward(params, pts, dirs)
    sdf_ctx, rgb_ctx = bound.forward(params, pts, dirs)
    np.testing.assert_allclose(np.asarray(sdf_ctx), np.asarray(sdf_ref),
                               atol=8e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(rgb_ctx), np.asarray(rgb_ref),
                               atol=2e-3)


def test_ctx_nablas_match():
    model, ref_model, params = make_models_with_ref()
    o, d = camera_rays()
    pts, near, far = sample_points(o, d)
    bound = model.bind_rays(params, o, d, near, far)

    sdf_ref, nab_ref = ref_model.forward_with_nablas(params, pts)
    sdf_ctx, nab_ctx = bound.forward_with_nablas(params, pts)
    np.testing.assert_allclose(np.asarray(sdf_ctx), np.asarray(sdf_ref),
                               atol=8e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(nab_ctx), np.asarray(nab_ref),
                               atol=5e-3, rtol=1e-2)


def test_ctx_batched_prefix():
    model, params = make_model()
    o, d = camera_rays(8)
    ob = o.reshape(2, 4, 3)
    db = d.reshape(2, 4, 3)
    near, far = near_far_from_sphere(ob, db)
    bound = model.bind_rays(params, ob, db, near, far)
    t = jnp.linspace(0.45, 0.55, 6)
    z = near + (far - near) * t
    pts = ob[..., None, :] + z[..., None] * db[..., None, :]
    dens = bound.forward_density_only(params, pts)
    assert dens.shape == (2, 4, 6)
    dens_flat = model.bind_rays(
        params, o, d, near.reshape(-1, 1), far.reshape(-1, 1)
    ).forward_density_only(params, pts.reshape(8, 6, 3))
    np.testing.assert_allclose(np.asarray(dens).reshape(8, 6),
                               np.asarray(dens_flat), atol=1e-5)


@pytest.mark.slow
def test_ctx_render_and_grads():
    """Full render through the bound path + gradient flow to features."""
    from neumesh_tpu.render.volume import volume_render_rays

    model, params = make_model()
    o, d = camera_rays(8)

    def render_loss(p):
        ret = volume_render_rays(
            model, p, o, d, jax.random.PRNGKey(0),
            calc_normal=True, detailed_output=True, samples_output=True,
            bounded_near_far=True, N_samples=16, N_importance=16,
            N_upsample_iters=2)
        return jnp.mean(ret["rgb"]) + jnp.mean(
            (jnp.linalg.norm(ret["implicit_nablas"], axis=-1) - 1) ** 2), ret

    (loss, ret), grads = jax.value_and_grad(
        render_loss, has_aux=True)(params)
    assert np.isfinite(float(loss))
    for key in ("geometry_features", "color_features", "indicator_vector"):
        g = np.asarray(grads[key])
        assert np.isfinite(g).all(), key
        assert np.abs(g).sum() > 0, f"no grad to {key}"
    assert np.isfinite(np.asarray(ret["rgb"])).all()


@pytest.mark.slow
def test_ctx_render_matches_unbound_render():
    """End-to-end render: bound vs slow path must produce the same image."""
    from neumesh_tpu.render.volume import volume_render_rays

    model, params = make_model()
    o, d = camera_rays(8)
    ret_fast = volume_render_rays(
        model, params, o, d, jax.random.PRNGKey(0), detailed_output=False,
        perturb=False, bounded_near_far=True, N_samples=16, N_importance=16,
        N_upsample_iters=2)

    class NoBind:
        """Strip bind_rays to force the per-sample reference path."""

        def __init__(self, m):
            self._m = m
            self.mesh_grid = m.mesh_grid
            self.enable_nablas_input = m.enable_nablas_input

        def __getattr__(self, k):
            if k == "bind_rays":
                raise AttributeError(k)
            return getattr(self._m, k)

    ret_ref = volume_render_rays(
        NoBind(model), params, o, d, jax.random.PRNGKey(0),
        detailed_output=False, perturb=False, bounded_near_far=True,
        N_samples=16, N_importance=16, N_upsample_iters=2)
    np.testing.assert_allclose(np.asarray(ret_fast["rgb"]),
                               np.asarray(ret_ref["rgb"]), atol=2e-2)
    # depth of an UNTRAINED model is a ratio of near-zero weights — compare
    # it acc-weighted (where visibility mass actually exists)
    acc = np.asarray(ret_ref["mask_volume"])
    d_err = np.abs(np.asarray(ret_fast["depth_volume"])
                   - np.asarray(ret_ref["depth_volume"]))
    assert np.max(d_err * acc) < 2e-2, (d_err, acc)


@pytest.mark.slow
def test_bf16_compute_mode_close_to_f32():
    """compute_dtype=bfloat16 keeps outputs within render tolerance of f32
    (geometry/kNN math stays f32)."""
    from neumesh_tpu.dataio.synthetic import sphere_mesh as _sm

    mesh = _sm(radius=0.5, n_theta=24, n_phi=48)
    rng = np.random.default_rng(9)
    mesh.vertices = mesh.vertices + rng.normal(size=mesh.vertices.shape) * 1e-4
    mesh.compute_vertex_normals()
    mg = MeshGrid(mesh, distance_method="grid")

    kw = dict(D_density=2, D_color=2, W=32, geometry_dim=4, color_dim=4,
              multires_view=2, multires_d=4, multires_fg=1, multires_ft=1,
              enable_nablas_input=True, learn_indicator_weight=True)
    m32 = NeuMesh(mg, **kw)
    m16 = NeuMesh(mg, compute_dtype=jnp.bfloat16, **kw)
    params = m32.init(jax.random.PRNGKey(0))

    o, d = camera_rays(8)
    pts, near, far = sample_points(o, d)
    dirs = jnp.broadcast_to(d[:, None, :], pts.shape)
    b32 = m32.bind_rays(params, o, d, near, far)
    b16 = m16.bind_rays(params, o, d, near, far)
    s32, c32 = b32.forward(params, pts, dirs)
    s16, c16 = b16.forward(params, pts, dirs)
    np.testing.assert_allclose(np.asarray(s16), np.asarray(s32), atol=2e-2)
    np.testing.assert_allclose(np.asarray(c16), np.asarray(c32), atol=2e-2)


def test_pallas_forward_matches_xla_path():
    """use_pallas=True (interpret mode on CPU) must match the XLA ctx path."""
    from neumesh_tpu.dataio.synthetic import sphere_mesh as _sm

    mesh = _sm(radius=0.5, n_theta=24, n_phi=48)
    rng = np.random.default_rng(9)
    mesh.vertices = mesh.vertices + rng.normal(size=mesh.vertices.shape) * 1e-4
    mesh.compute_vertex_normals()
    mg = MeshGrid(mesh, distance_method="grid")
    kw = dict(D_density=2, D_color=2, W=32, geometry_dim=4, color_dim=4,
              multires_view=2, multires_d=4, multires_fg=1, multires_ft=1,
              enable_nablas_input=True, learn_indicator_weight=True)
    m_x = NeuMesh(mg, **kw)
    m_p = NeuMesh(mg, use_pallas=True, **kw)
    params = m_x.init(jax.random.PRNGKey(0))

    o, d = camera_rays(8)
    pts, near, far = sample_points(o, d)
    dirs = jnp.broadcast_to(d[:, None, :], pts.shape)
    b_x = m_x.bind_rays(params, o, d, near, far)
    b_p = m_p.bind_rays(params, o, d, near, far)

    def close(a, b, atol, frac=0.97):
        # near-ties at the top-8 boundary legitimately differ between the
        # kernel's threshold loop and top_k; demand the vast majority match
        ok = np.abs(np.asarray(a) - np.asarray(b)) <= atol
        assert ok.mean() >= frac, (ok.mean(),
                                   np.abs(np.asarray(a)
                                          - np.asarray(b)).max())

    s_x, c_x = b_x.forward(params, pts, dirs)
    s_p, c_p = b_p.forward(params, pts, dirs)
    close(s_p, s_x, 1e-4)
    close(c_p, c_x, 1e-3)

    d_x = b_x.forward_density_only(params, pts)
    d_p = b_p.forward_density_only(params, pts)
    close(d_p, d_x, 1e-4)

    sn_x, n_x = b_x.forward_with_nablas(params, pts)
    sn_p, n_p = b_p.forward_with_nablas(params, pts)
    close(n_p, n_x, 2e-3)


def test_tile_cell_budget_contexts():
    """tile_cell_budget pre-ranks CELLS before expanding candidate lists
    (make_tile_context). With a budget >= the tile's unique cell count
    the resulting context must select the same candidate set as the
    unbudgeted build (densities identical); a tight budget must still
    keep the near-surface candidates (density error bounded on the
    sphere)."""
    mesh = sphere_mesh(radius=0.5, n_theta=24, n_phi=48)
    mesh.compute_vertex_normals()
    mg = MeshGrid(mesh, distance_method="grid")
    kw = dict(D_density=2, D_color=2, W=32, geometry_dim=4, color_dim=4,
              multires_view=2, multires_d=4, multires_fg=1, multires_ft=1,
              enable_nablas_input=True, learn_indicator_weight=True)
    o, d = camera_rays(16)
    near, far = near_far_from_sphere(o, d)
    t = jnp.linspace(0.2, 0.3, 6)
    z = near * (1 - t) + far * t
    pts = o[:, None, :] + z[..., None] * d[:, None, :]

    outs = {}
    for cb in (0, 256, 16):
        m = NeuMesh(mg, tile_cell_budget=cb, **kw)
        params = m.init(jax.random.PRNGKey(0))
        bound, _, _ = m.bind_rays_tiled(params, o, d, near, far, tile=8)
        outs[cb] = np.asarray(
            bound.forward_density_only(params, pts))
    # generous budget (>= T*P probe slots) selects identical candidates
    np.testing.assert_array_equal(outs[256], outs[0])
    # tight budget keeps the near-surface field intact
    np.testing.assert_allclose(outs[16], outs[0], atol=1e-5)

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neumesh_tpu.dataio.synthetic import sphere_mesh
from neumesh_tpu.mesh import MeshGrid
from neumesh_tpu.models.neumesh.model import NeuMesh
from neumesh_tpu.ops.interp import interpolate_features


@pytest.fixture(scope="module")
def mesh_grid():
    mesh = sphere_mesh(radius=0.5, n_theta=24, n_phi=48)
    return MeshGrid(mesh, distance_method="brute")


@pytest.fixture(scope="module")
def tiny_model(mesh_grid):
    model = NeuMesh(mesh_grid, D_density=2, D_color=2, W=64,
                    geometry_dim=8, color_dim=8, multires_view=2,
                    multires_d=4, multires_fg=1, multires_ft=1,
                    enable_nablas_input=True, learn_indicator_weight=True)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_interpolate_features_manual():
    feats = jnp.arange(12.0).reshape(4, 3)
    idx = jnp.array([[0, 2]])
    w = jnp.array([[0.25, 0.75]])
    out = np.asarray(interpolate_features(feats, idx, w))
    want = 0.25 * np.arange(3) + 0.75 * np.arange(6, 9)
    np.testing.assert_allclose(out[0], want, atol=1e-6)


def _reference_distance_np(xyz, vertices, normals, indices, w1):
    """Literal numpy transcription of the reference formula
    (models/mesh_grid.py:121-142) as golden reference."""
    v = vertices[indices]                    # (Q, K, 3)
    dis = np.linalg.norm(xyz[:, None] - v, axis=-1)
    w = 1.0 / (dis + 1e-7)
    w = w / w.sum(-1, keepdims=True)
    dir_vec = xyz[:, None] - v
    w2 = np.linalg.norm(dir_vec, axis=-1, keepdims=True)
    middle = (normals[indices] * w1 + dir_vec * w2) / (w1 + w2)
    d = (w[..., None] * np.sum(dir_vec * middle, -1, keepdims=True)).sum(-2)
    return d[:, 0]


def test_compute_distance_matches_reference_formula(mesh_grid, tiny_model):
    """Parity with the reference's analytic formula, and a loose sanity:
    the proxy correlates with the true signed offset near the surface
    (it is NOT an exact SDF — the indicator terms are learnable)."""
    model, params = tiny_model
    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(64, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    offsets = rng.uniform(-0.05, 0.05, size=(64, 1))
    x = jnp.asarray((dirs * (0.5 + offsets)).astype(np.float32))
    ds, idx, w = model.compute_distance(params, x)
    ds = np.asarray(ds)[:, 0]
    assert idx.shape == (64, 8) and w.shape == (64, 8)
    np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, atol=1e-5)

    w1 = 1.0 / (1.0 + np.exp(2.0))  # sigmoid(-2): init indicator weight
    want = _reference_distance_np(
        np.asarray(x, np.float64),
        np.asarray(mesh_grid.vertices, np.float64),
        np.asarray(params["indicator_vector"], np.float64),
        np.asarray(idx), w1)
    np.testing.assert_allclose(ds, want, atol=1e-4)
    cc = np.corrcoef(ds, offsets[:, 0])[0, 1]
    assert cc > 0.9, cc


def test_forward_shapes(tiny_model):
    model, params = tiny_model
    x = jnp.asarray(np.random.default_rng(1).uniform(
        -0.6, 0.6, size=(5, 7, 3)).astype(np.float32))
    v = jnp.ones((5, 7, 3)) / np.sqrt(3)
    sdf, rgb = model.forward(params, x, v)
    assert sdf.shape == (5, 7)
    assert rgb.shape == (5, 7, 3)
    assert np.all(np.asarray(rgb) >= 0) and np.all(np.asarray(rgb) <= 1)
    d_only = model.forward_density_only(params, x)
    np.testing.assert_allclose(np.asarray(d_only), np.asarray(sdf), atol=1e-5)


def test_forward_with_nablas_fd(tiny_model):
    """FD check against the FIXED-kNN-selection density — the function the
    gradient is defined over (the reference detaches kNN indices/weights,
    mesh_grid.py:121-122, so h(x) is piecewise; FD across a kNN-set boundary
    is meaningless)."""
    from neumesh_tpu.ops import interp

    model, params = tiny_model
    rng = np.random.default_rng(2)
    dirs = rng.normal(size=(16, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    x = jnp.asarray((dirs * 0.52).astype(np.float32))
    sdf, nablas = model.forward_with_nablas(params, x)
    assert nablas.shape == (16, 3)

    weights, indices = model._knn(params, x)
    w1 = model.forward_indicator_weight(params)

    def fixed_density(xq):
        ds = interp.interpolated_distance(
            xq, model.mesh_grid.vertices, indices, weights,
            params["indicator_vector"], w1)
        d, _ = model._density_from_parts(params, ds, indices, weights)
        return np.asarray(d)[..., 0]

    eps = 1e-3
    for dim in range(3):
        dx = jnp.zeros((1, 3)).at[0, dim].set(eps)
        fd = (fixed_density(x + dx) - fixed_density(x - dx)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(nablas[:, dim]), fd,
                                   atol=5e-3, rtol=5e-3)


@pytest.mark.slow
def test_grad_flows_to_features_and_indicator(tiny_model):
    model, params = tiny_model
    x = jnp.asarray(np.random.default_rng(3).uniform(
        -0.55, 0.55, size=(32, 3)).astype(np.float32))
    v = jnp.ones((32, 3)) / np.sqrt(3)

    def loss(p):
        sdf, rgb = model.forward(p, x, v)
        return jnp.mean(rgb) + jnp.mean(sdf**2)

    g = jax.grad(loss)(params)
    for key in ("geometry_features", "color_features", "indicator_vector",
                "indicator_weight_raw"):
        leaf = np.asarray(g[key])
        assert np.isfinite(leaf).all(), key
        assert np.abs(leaf).sum() > 0, f"no gradient reached {key}"


@pytest.mark.slow
def test_eikonal_double_backward(tiny_model):
    """grad of (|| grad_x sdf || - 1)^2 w.r.t. params must be finite."""
    model, params = tiny_model
    rng = np.random.default_rng(4)
    dirs = rng.normal(size=(8, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    x = jnp.asarray((dirs * 0.5).astype(np.float32))

    def eik_loss(p):
        _, nablas = model.forward_with_nablas(p, x)
        return jnp.mean((jnp.linalg.norm(nablas, axis=-1) - 1.0) ** 2)

    g = jax.grad(eik_loss)(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(leaf)).all() for leaf in flat)
    assert np.abs(np.asarray(g["indicator_vector"])).sum() > 0


@pytest.mark.slow
def test_render_neumesh_end_to_end(tiny_model):
    """Full volume render through the NeuMesh protocol incl. mesh-bounded
    near/far (the reference's default path for NeuMesh)."""
    from neumesh_tpu.render.volume import volume_render_rays

    model, params = tiny_model
    n = 12
    o = jnp.tile(jnp.array([[0.0, 0.0, -2.5]]), (n, 1))
    ang = jnp.linspace(-0.05, 0.05, n)
    d = jnp.stack([ang, jnp.zeros(n), jnp.ones(n)], -1)
    ret = volume_render_rays(
        model, params, o, d, jax.random.PRNGKey(0),
        calc_normal=True, detailed_output=True, samples_output=True,
        bounded_near_far=True, N_samples=16, N_importance=16,
        N_upsample_iters=2)
    assert ret["rgb"].shape == (n, 3)
    assert np.isfinite(np.asarray(ret["rgb"])).all()
    assert np.isfinite(np.asarray(ret["implicit_nablas"])).all()


def test_grid_and_brute_mesh_grid_agree():
    mesh = sphere_mesh(radius=0.5, n_theta=24, n_phi=48)
    mg_b = MeshGrid(mesh, distance_method="brute")
    mg_g = MeshGrid(mesh, distance_method="grid")
    rng = np.random.default_rng(5)
    dirs = rng.normal(size=(128, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    x = jnp.asarray((dirs * rng.uniform(0.4, 0.6, (128, 1)))
                    .astype(np.float32))
    db, _, _ = mg_b.compute_distance(x)
    dg, _, _ = mg_g.compute_distance(x)
    np.testing.assert_allclose(np.asarray(db), np.asarray(dg), atol=1e-4)


def test_eikonal_grad_finite_with_zero_nablas():
    """Regression (round-1 NaN): jnp.linalg.norm has NaN gradient at
    exactly-zero vectors; the eikonal term must stay finite when a sample
    produces an all-zero nabla (f32 underflow in long runs)."""
    from neumesh_tpu.train.trainer import Trainer

    model, params = None, None  # not needed: test the loss formula directly

    def eik_loss(nablas):
        norm = jnp.sqrt(jnp.sum(nablas * nablas, axis=-1) + 1e-12)
        return jnp.mean((norm - 1.0) ** 2)

    nablas = jnp.zeros((4, 3)).at[0].set(jnp.array([1.0, 0.0, 0.0]))
    g = jax.grad(eik_loss)(nablas)
    assert np.isfinite(np.asarray(g)).all()

    # the raw-norm formulation would produce NaN — prove the guard matters
    def bad_loss(nablas):
        return jnp.mean((jnp.linalg.norm(nablas, axis=-1) - 1.0) ** 2)

    g_bad = jax.grad(bad_loss)(nablas)
    assert not np.isfinite(np.asarray(g_bad)).all()


def test_interpolated_distance_grad_on_vertex():
    """Gradient must stay finite when a query coincides exactly with a
    vertex (w2 = 0)."""
    from neumesh_tpu.ops.interp import (
        interpolated_distance_from_parts,
        knn_weights,
    )

    nbr_pts = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8, 3)),
                          jnp.float32)
    nbr_ind = jnp.ones((1, 8, 3)) / np.sqrt(3)
    w = jnp.full((1, 8), 0.125)

    def f(x):
        return interpolated_distance_from_parts(
            x, nbr_pts, nbr_ind, w, 0.1)[0, 0]

    x0 = nbr_pts[0, 0]  # exactly on a vertex
    g = jax.grad(f)(x0[None])
    assert np.isfinite(np.asarray(g)).all()

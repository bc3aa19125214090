import jax.numpy as jnp
import numpy as np

from neumesh_tpu.ops.knn import build_candidate_grid, knn_brute


def sphere_points(n=3000, r=0.5, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return (v * r).astype(np.float32)


def test_brute_knn_exact(rng):
    pts = rng.normal(size=(200, 3)).astype(np.float32)
    q = rng.normal(size=(50, 3)).astype(np.float32)
    sq, idx = knn_brute(jnp.asarray(q), jnp.asarray(pts), 5)
    d2_full = ((q[:, None, :] - pts[None]) ** 2).sum(-1)
    want_idx = np.argsort(d2_full, axis=1)[:, :5]
    np.testing.assert_allclose(
        np.sort(np.asarray(sq), 1), np.sort(
            np.take_along_axis(d2_full, want_idx, 1), 1), rtol=1e-4,
        atol=1e-5)
    assert (np.sort(np.asarray(idx), 1) == np.sort(want_idx, 1)).mean() > 0.99


def test_grid_matches_brute_near_surface():
    v = sphere_points(5000)
    grid = build_candidate_grid(v)
    rng = np.random.default_rng(1)
    q = v[rng.choice(len(v), 800)] + rng.normal(size=(800, 3)) * 0.01
    q = q.astype(np.float32)
    sq_g, idx_g = grid.query(jnp.asarray(q), k=8)
    sq_b, idx_b = knn_brute(jnp.asarray(q), jnp.asarray(v), 8)
    # the grid is validated on DISTANCES (what the inverse-distance weights
    # consume); indices may differ on ties / the farthest slots
    d_g = np.sqrt(np.asarray(sq_g))
    d_b = np.sqrt(np.asarray(sq_b))
    rel = np.abs(d_g - d_b) / np.maximum(d_b, 1e-6)
    assert rel.mean() < 5e-3, rel.mean()
    agree = (np.sort(np.asarray(idx_g), 1)
             == np.sort(np.asarray(idx_b), 1)).mean()
    assert agree > 0.9, agree


def test_grid_no_duplicate_neighbours():
    v = sphere_points(2000)
    grid = build_candidate_grid(v)
    rng = np.random.default_rng(2)
    q = (v[rng.choice(len(v), 200)]
         + rng.normal(size=(200, 3)) * 0.02).astype(np.float32)
    _, idx = grid.query(jnp.asarray(q), k=8)
    idx = np.asarray(idx)
    for row in idx:
        assert len(np.unique(row)) == len(row)


def test_grid_far_queries_nearest_region():
    """Far-away queries clamp into boundary cells whose candidates are the
    genuinely nearest mesh region — the 1-NN must be near-exact."""
    v = sphere_points(2000)
    grid = build_candidate_grid(v)
    rng = np.random.default_rng(3)
    q = rng.normal(size=(64, 3)).astype(np.float32) * 4.0
    sq_g, idx_g = grid.query(jnp.asarray(q), k=8)
    sq_b, idx_b = knn_brute(jnp.asarray(q), jnp.asarray(v), 8)
    # nearest-neighbour distance within 5% of exact
    np.testing.assert_allclose(np.sqrt(np.asarray(sq_g)[:, 0]),
                               np.sqrt(np.asarray(sq_b)[:, 0]), rtol=0.05)
    assert np.isfinite(np.asarray(sq_g)).all()


def test_grid_query_chunked_consistent():
    v = sphere_points(1000)
    grid = build_candidate_grid(v)
    rng = np.random.default_rng(3)
    q = (v[rng.choice(len(v), 300)]).astype(np.float32)
    sq1, idx1 = grid.query(jnp.asarray(q), k=8, q_chunk=10000)
    sq2, idx2 = grid.query(jnp.asarray(q), k=8, q_chunk=64)
    np.testing.assert_allclose(np.asarray(sq1), np.asarray(sq2), atol=1e-7)
    assert (np.asarray(idx1) == np.asarray(idx2)).all()


def test_grid_tiny_pointset():
    v = sphere_points(6)
    grid = build_candidate_grid(v)
    q = np.zeros((4, 3), np.float32)
    sq, idx = grid.query(jnp.asarray(q), k=6)
    assert sq.shape == (4, 6)
    assert np.isfinite(np.asarray(sq)).all()


def test_interpolated_distance_sign_and_grad():
    """h(x) must be ~signed distance near a flat patch: positive outside
    (along normals), negative inside; grad ~ normal direction."""
    import jax
    from neumesh_tpu.ops.interp import interpolated_distance, knn_weights

    xs, ys = np.meshgrid(np.linspace(-1, 1, 40), np.linspace(-1, 1, 40))
    v = np.stack([xs.ravel(), ys.ravel(), np.zeros(1600)], -1)
    v = jnp.asarray(v, jnp.float32)
    normals = jnp.tile(jnp.array([[0.0, 0.0, 1.0]], jnp.float32), (1600, 1))

    q = jnp.array([[0.1, 0.05, 0.2], [0.0, -0.2, -0.15]], jnp.float32)
    sq, idx = knn_brute(q, v, 8)
    w = knn_weights(sq)
    d = interpolated_distance(q, v, idx, w, normals, 0.5)
    d = np.asarray(d)[:, 0]
    assert d[0] > 0 and d[1] < 0
    np.testing.assert_allclose(d, [0.2, -0.15], atol=0.08)

    def dist_fn(x):
        sq_, idx_ = knn_brute(x[None], v, 8)
        w_ = knn_weights(sq_)
        return interpolated_distance(x[None], v, idx_, w_, normals, 0.5)[0, 0]

    g = np.asarray(jax.grad(dist_fn)(q[0]))
    g = g / np.linalg.norm(g)
    assert g[2] > 0.95


def test_knn_stop_gradient_semantics():
    """MeshGrid.compute_distance: grads flow through xyz analytically but
    NOT through the kNN selection (reference mesh_grid.py:121-122)."""
    import jax
    from neumesh_tpu.mesh import MeshGrid, TriangleMesh

    v = sphere_points(500)
    tris = np.stack([np.arange(498), np.arange(1, 499), np.arange(2, 500)], 1)
    mg = MeshGrid(TriangleMesh(v, tris), distance_method="brute")

    def f(x):
        d, _, _ = mg.compute_distance(x[None])
        return d[0, 0]

    x0 = jnp.asarray(v[0] * 1.2)
    g = jax.grad(f)(x0)
    assert np.all(np.isfinite(np.asarray(g)))
    eps = 1e-3
    for dim in range(3):
        dx = jnp.zeros(3).at[dim].set(eps)
        fd = (f(x0 + dx) - f(x0 - dx)) / (2 * eps)
        np.testing.assert_allclose(float(g[dim]), float(fd), atol=5e-2)


def test_grid_pytree_structure_stable_across_query():
    """Registered pytree leaves must not change type/identity when the
    per-sample query path triggers the lazy device transfer (a leaf that
    flips numpy->jnp across calls changes what jit sees)."""
    import jax

    v = sphere_points(500)
    grid = build_candidate_grid(v)
    leaves0, treedef0 = jax.tree_util.tree_flatten(grid)
    types0 = [type(l) for l in leaves0]
    grid.query(jnp.asarray(v[:16]), k=4)  # triggers _pts_device()
    leaves1, treedef1 = jax.tree_util.tree_flatten(grid)
    assert treedef0 == treedef1
    assert [type(l) for l in leaves1] == types0
    for a, b in zip(leaves0, leaves1):
        assert a is b

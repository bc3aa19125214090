"""Native C++ host library vs numpy references."""
import numpy as np
import pytest

from neumesh_tpu.cpp import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib not built")


def test_native_mt_matches_numpy_sphere():
    from neumesh_tpu.mesh.marching_cubes import marching_tetrahedra

    xs = np.linspace(-1, 1, 32)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    field = (np.sqrt(X**2 + Y**2 + Z**2) - 0.5).astype(np.float32)

    v_np, t_np = marching_tetrahedra(field.astype(np.float64), 0.0)
    v_c, t_c = native.marching_tetrahedra(field, 0.0)
    assert len(t_c) == len(t_np)
    # same vertex set (order may differ)
    sv_np = np.sort(np.round(v_np, 5).view([("x", float), ("y", float),
                                            ("z", float)]), order=["x", "y",
                                                                   "z"],
                    axis=0)
    sv_c = np.sort(np.round(v_c, 5).view([("x", float), ("y", float),
                                          ("z", float)]), order=["x", "y",
                                                                 "z"], axis=0)
    assert len(sv_np) == len(sv_c)
    np.testing.assert_allclose(sv_np["x"], sv_c["x"], atol=1e-4)
    np.testing.assert_allclose(sv_np["y"], sv_c["y"], atol=1e-4)


def test_native_mt_orientation():
    xs = np.linspace(-1, 1, 32)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    field = (np.sqrt(X**2 + Y**2 + Z**2) - 0.5).astype(np.float32)
    v, t = native.marching_tetrahedra(field, 0.0)
    h = xs[1] - xs[0]
    world = v * h + (-1.0)
    fn = np.cross(world[t[:, 1]] - world[t[:, 0]],
                  world[t[:, 2]] - world[t[:, 0]])
    centers = world[t].mean(1)
    dots = np.sum(fn * centers, -1)
    assert (dots > 0).mean() > 0.99  # normals outward


def test_native_mc_matches_numpy():
    """C++ and numpy marching cubes agree: identical vertex SET (the
    PyMCubes-comparability invariant) and identical triangle multiset up
    to vertex reindexing, on a blobby field that exercises ambiguous
    (4-crossing) faces."""
    from neumesh_tpu.mesh.marching_cubes import marching_cubes

    rng = np.random.default_rng(7)
    xs = np.linspace(-1, 1, 24)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    field = np.full(X.shape, 0.4)
    for _ in range(5):
        c = rng.uniform(-0.5, 0.5, 3)
        r = rng.uniform(0.15, 0.45)
        d = np.sqrt((X - c[0])**2 + (Y - c[1])**2 + (Z - c[2])**2)
        field = np.minimum(field, d - r)
    field = field.astype(np.float32)

    v_np, t_np = marching_cubes(field.astype(np.float64), 0.0)
    v_c, t_c = native.marching_cubes(field, 0.0)
    assert len(v_np) == len(v_c) and len(t_np) == len(t_c)

    def canon(v, t):
        order = np.lexsort((v[:, 2], v[:, 1], v[:, 0]))
        rank = np.empty(len(v), np.int64)
        rank[order] = np.arange(len(v))
        vt = rank[t]
        # rotate each triangle so the smallest index leads (keeps winding)
        s = np.argmin(vt, axis=1)
        vt = np.stack([vt[np.arange(len(vt)), (s + i) % 3]
                       for i in range(3)], axis=1)
        return v[order], vt[np.lexsort((vt[:, 2], vt[:, 1], vt[:, 0]))]

    cv_np, ct_np = canon(np.round(v_np, 4), t_np)
    cv_c, ct_c = canon(np.round(v_c, 4), t_c)
    np.testing.assert_allclose(cv_np, cv_c, atol=1e-3)
    np.testing.assert_array_equal(ct_np, ct_c)


def test_native_mc_orientation():
    xs = np.linspace(-1, 1, 32)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    field = (np.sqrt(X**2 + Y**2 + Z**2) - 0.5).astype(np.float32)
    v, t = native.marching_cubes(field, 0.0)
    h = xs[1] - xs[0]
    world = v * h + (-1.0)
    fn = np.cross(world[t[:, 1]] - world[t[:, 0]],
                  world[t[:, 2]] - world[t[:, 0]])
    centers = world[t].mean(1)
    dots = np.sum(fn * centers, -1)
    assert (dots > 0).mean() > 0.99  # normals outward


def test_kdtree_vs_bruteforce(rng):
    pts = rng.normal(size=(2000, 3))
    q = rng.normal(size=(100, 3))
    tree = native.KDTree(pts)
    dist, idx = tree.query(q, k=5)
    d2 = ((q[:, None] - pts[None]) ** 2).sum(-1)
    want_idx = np.argsort(d2, axis=1)[:, :5]
    want_d = np.sqrt(np.take_along_axis(d2, want_idx, 1))
    np.testing.assert_allclose(dist, want_d, atol=1e-10)
    assert (np.sort(idx, 1) == np.sort(want_idx, 1)).mean() > 0.999


def test_bvh_sphere_hits():
    from neumesh_tpu.dataio.synthetic import sphere_mesh
    mesh = sphere_mesh(radius=0.5, n_theta=32, n_phi=64)
    bvh = native.BVH(mesh.vertices, mesh.triangles)
    n = 64
    rng = np.random.default_rng(0)
    # rays from outside toward origin: must hit at t ~ dist - 0.5
    origins = rng.normal(size=(n, 3))
    origins /= np.linalg.norm(origins, axis=1, keepdims=True)
    origins *= 2.0
    dirs = -origins / 2.0
    t_hit, prim = bvh.cast(origins, dirs)
    assert (prim >= 0).all()
    np.testing.assert_allclose(t_hit, 1.5, atol=0.01)
    # rays pointing away: all miss
    t_miss, prim_miss = bvh.cast(origins, -dirs)
    assert (prim_miss == -1).all() and np.isinf(t_miss).all()


def test_arap_rigid_translation():
    """Constraining all boundary vertices to a translated position must
    translate the whole mesh ~rigidly."""
    from neumesh_tpu.dataio.synthetic import sphere_mesh
    mesh = sphere_mesh(radius=0.5, n_theta=12, n_phi=24)
    v = mesh.vertices
    t = mesh.triangles
    shift = np.array([0.3, -0.1, 0.2])
    # constrain a band of vertices around the equator
    band = np.where(np.abs(v[:, 2]) < 0.1)[0]
    out = native.arap(v, t, band, v[band] + shift, max_iter=10)
    err = np.abs(out - (v + shift)).max()
    assert err < 0.05, err


def test_arap_partial_constraints_smooth():
    from neumesh_tpu.dataio.synthetic import sphere_mesh
    mesh = sphere_mesh(radius=0.5, n_theta=12, n_phi=24)
    v = mesh.vertices
    t = mesh.triangles
    top = np.where(v[:, 2] > 0.45)[0]
    bottom = np.where(v[:, 2] < -0.45)[0]
    cids = np.concatenate([top, bottom])
    cpos = np.concatenate([v[top] + [0, 0, 0.2], v[bottom]])
    out = native.arap(v, t, cids, cpos, max_iter=15)
    # constrained satisfied
    np.testing.assert_allclose(out[top], v[top] + [0, 0, 0.2], atol=1e-6)
    np.testing.assert_allclose(out[bottom], v[bottom], atol=1e-6)
    # interior deformed smoothly: no vertex flies away
    assert np.abs(out - v).max() < 0.5
    assert np.isfinite(out).all()

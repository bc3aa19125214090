import numpy as np

from neumesh_tpu.mesh.marching_cubes import extract_isosurface


def sphere_field(n=48, r=0.5, bound=1.0):
    xs = np.linspace(-bound, bound, n)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    field = np.sqrt(X**2 + Y**2 + Z**2) - r
    spacing = (xs[1] - xs[0],) * 3
    origin = (-bound,) * 3
    return field, origin, spacing


def test_sphere_isosurface_vertices_on_sphere():
    field, origin, spacing = sphere_field()
    mesh = extract_isosurface(field, 0.0, origin, spacing, backend="numpy")
    assert mesh.n_vertices > 500
    radii = np.linalg.norm(mesh.vertices, axis=-1)
    np.testing.assert_allclose(radii, 0.5, atol=0.01)


def test_sphere_normals_outward():
    field, origin, spacing = sphere_field()
    mesh = extract_isosurface(field, 0.0, origin, spacing, backend="numpy")
    normals = mesh.compute_vertex_normals()
    dots = np.sum(normals * mesh.vertices, axis=-1) / np.maximum(
        np.linalg.norm(mesh.vertices, axis=-1), 1e-9)
    assert (dots > 0.9).mean() > 0.99


def test_watertight_sphere_area_and_no_degenerate():
    field, origin, spacing = sphere_field(n=64)
    mesh = extract_isosurface(field, 0.0, origin, spacing, backend="numpy")
    # surface area close to 4*pi*r^2
    v = mesh.vertices
    t = mesh.triangles
    fn = np.cross(v[t[:, 1]] - v[t[:, 0]], v[t[:, 2]] - v[t[:, 0]])
    area = 0.5 * np.linalg.norm(fn, axis=-1).sum()
    np.testing.assert_allclose(area, 4 * np.pi * 0.25, rtol=0.03)
    assert not mesh.degenerate_triangle_mask().any()
    # watertight: every edge shared by exactly 2 triangles
    edges = np.concatenate([t[:, [0, 1]], t[:, [1, 2]], t[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()


def test_nonzero_iso_level():
    field, origin, spacing = sphere_field()
    mesh = extract_isosurface(field, 0.1, origin, spacing, backend="numpy")
    radii = np.linalg.norm(mesh.vertices, axis=-1)
    np.testing.assert_allclose(radii, 0.6, atol=0.01)


def test_empty_field():
    field = np.ones((8, 8, 8))
    mesh = extract_isosurface(field, 0.0, backend="numpy")
    assert mesh.n_vertices == 0 and mesh.n_triangles == 0


def test_ply_uv_roundtrip(tmp_path):
    from neumesh_tpu.mesh.triangle_mesh import TriangleMesh, load_ply, save_ply

    rng = np.random.default_rng(0)
    m = TriangleMesh(
        rng.normal(size=(20, 3)),
        np.stack([np.arange(18), np.arange(1, 19), np.arange(2, 20)], 1))
    m.vertex_uvs = rng.uniform(size=(20, 2))
    p = str(tmp_path / "uv.ply")
    save_ply(m, p)
    m2 = load_ply(p)
    assert m2.vertex_uvs is not None
    np.testing.assert_allclose(m2.vertex_uvs, m.vertex_uvs, atol=1e-6)

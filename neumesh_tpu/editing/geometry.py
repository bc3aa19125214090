"""Geometry editing (reference editing/render_geometry_editing.py):
swap the mesh scaffold for a deformed mesh (made offline, e.g. in Blender)
and rotate each vertex's indicator vector by the rotation aligning the old
vertex normal to the new one. Features are untouched — the edit is purely a
scaffold swap.
"""
from __future__ import annotations

import numpy as np

from ..mesh import MeshGrid
from ..mesh.triangle_mesh import TriangleMesh


def rodrigues(axis_angle: np.ndarray) -> np.ndarray:
    """(N, 3) axis-angle -> (N, 3, 3) rotation matrices; zero vector maps to
    identity (kornia angle_axis_to_rotation_matrix semantics used at
    reference render_geometry_editing.py:55-57)."""
    theta = np.linalg.norm(axis_angle, axis=-1, keepdims=True)  # (N, 1)
    small = theta[:, 0] < 1e-12
    axis = axis_angle / np.where(theta < 1e-12, 1.0, theta)
    x, y, z = axis[:, 0], axis[:, 1], axis[:, 2]
    K = np.zeros((len(axis), 3, 3))
    K[:, 0, 1], K[:, 0, 2] = -z, y
    K[:, 1, 0], K[:, 1, 2] = z, -x
    K[:, 2, 0], K[:, 2, 1] = -y, x
    c = np.cos(theta)[..., None]
    s = np.sin(theta)[..., None]
    eye = np.broadcast_to(np.eye(3), (len(axis), 3, 3))
    R = c * eye + s * K + (1 - c) * np.einsum("ni,nj->nij", axis, axis)
    R[small] = np.eye(3)
    return R


def deform_model(deformed_mesh: TriangleMesh, model, params: dict,
                 fix_indicator: bool = False):
    """Rebuild the MeshGrid from the deformed mesh and rotate indicator
    vectors by the old->new normal rotation (180-degree flips handled)
    (reference render_geometry_editing.py:37-67). Returns updated params;
    `model.mesh_grid` is replaced in place."""
    deformed_mesh_grid = MeshGrid(
        deformed_mesh, distance_method=model.mesh_grid.distance_method)

    if not fix_indicator:
        n_old = np.asarray(model.mesh_grid.vertex_normals, np.float64)
        n_new = np.asarray(deformed_mesh_grid.vertex_normals, np.float64)
        assert len(n_old) == len(n_new), (
            "deformed mesh must keep the vertex count/order")
        rot_axis = np.cross(n_old, n_new)
        cos_theta = np.clip(
            np.sum(n_old * n_new, -1)
            / (np.linalg.norm(n_old, axis=-1)
               * np.linalg.norm(n_new, axis=-1)), -1.0, 1.0)
        rot_180 = cos_theta == -1
        rot_rad = np.arccos(cos_theta)[:, None]
        R = rodrigues(rot_axis * rot_rad)  # (N, 3, 3)

        ind = np.asarray(params["indicator_vector"], np.float64)
        new_ind = np.einsum("nij,nj->ni", R, ind)
        new_ind[rot_180] *= -1

        import jax.numpy as jnp
        params = dict(params)
        params["indicator_vector"] = jnp.asarray(new_ind, jnp.float32)

    model.mesh_grid = deformed_mesh_grid
    return params

"""MeshGrid: device-resident mesh scaffold + interpolated signed distance.

Equivalent of reference models/mesh_grid.py:45-150 (MeshGrid over FRNN) with
the kNN structure replaced by the TPU uniform grid (ops/knn.py) and ray
casting delegated to the host raycaster (mesh/raycast.py) — ray casting is
only used in offline editing preprocessing (reference editing/paint.py:34-52).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import interp
from ..ops.knn import UniformGrid, build_uniform_grid, knn_brute
from .triangle_mesh import TriangleMesh


class MeshGrid:
    def __init__(self, mesh: TriangleMesh, distance_method: str = "grid",
                 cell_size: Optional[float] = None):
        """distance_method: 'grid' (uniform-grid kNN, the frnn analog) or
        'brute' (exact O(Q*N), small meshes / testing)."""
        self.mesh = mesh
        if mesh.vertex_normals is None:
            mesh.compute_vertex_normals()
        self.vertices = jnp.asarray(mesh.vertices, dtype=jnp.float32)
        self.vertex_normals = jnp.asarray(
            mesh.vertex_normals, dtype=jnp.float32)
        self.distance_method = distance_method
        if distance_method == "grid":
            self.grid: Optional[UniformGrid] = build_uniform_grid(
                mesh.vertices, cell_size=cell_size)
        elif distance_method == "brute":
            self.grid = None
        else:
            raise NotImplementedError(distance_method)

    def get_number_of_vertices(self) -> int:
        return int(self.vertices.shape[0])

    # ------------------------------------------------------------------
    def device_buffers(self) -> dict:
        """Pytree of the large device tables, for passing as jit
        ARGUMENTS. Closed-over jnp arrays embed as constants in the
        serialized program; at production mesh sizes (100k+ vertices)
        the program exceeds remote-compile upload limits and recompiles
        for every mesh. Pass this dict into a step jitted with
        `bound_buffers` instead."""
        bufs = {"vertices": self.vertices,
                "vertex_normals": self.vertex_normals}
        if self.grid is not None:
            bufs["cand_idx"] = self.grid.cand_idx
            bufs["cell_row"] = self.grid.cell_row
        return bufs

    def bound_buffers(self, bufs):
        """Context manager swapping the large tables for `bufs` (tracers
        during trace); restores the originals on exit so the model object
        never retains tracers. No-op when bufs is None."""
        from contextlib import contextmanager

        @contextmanager
        def cm():
            if bufs is None:
                yield self
                return
            old = (self.vertices, self.vertex_normals,
                   self.grid.cand_idx if self.grid is not None else None,
                   self.grid.cell_row if self.grid is not None else None)
            self.vertices = bufs["vertices"]
            self.vertex_normals = bufs["vertex_normals"]
            if self.grid is not None and "cand_idx" in bufs:
                self.grid.cand_idx = bufs["cand_idx"]
            if self.grid is not None and "cell_row" in bufs:
                self.grid.cell_row = bufs["cell_row"]
            try:
                yield self
            finally:
                self.vertices, self.vertex_normals = old[0], old[1]
                if self.grid is not None and old[2] is not None:
                    self.grid.cand_idx = old[2]
                if self.grid is not None and old[3] is not None:
                    self.grid.cell_row = old[3]

        return cm()

    # ------------------------------------------------------------------
    def knn(self, xyz: jnp.ndarray, K: int = 8) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(..., 3) -> stop-gradient (sq_dist (..., K), indices (..., K))."""
        x = jax.lax.stop_gradient(xyz)
        if self.grid is not None:
            sq, idx = self.grid.query(x, k=K)
        else:
            shape = x.shape[:-1]
            sq, idx = knn_brute(x.reshape(-1, 3), self.vertices, K)
            sq = sq.reshape(shape + (K,))
            idx = idx.reshape(shape + (K,))
        return jax.lax.stop_gradient(sq), jax.lax.stop_gradient(idx)

    def compute_distance(
        self,
        xyz: jnp.ndarray,
        indicator_vector: Optional[jnp.ndarray] = None,
        indicator_weight=0.1,
        K: int = 8,
    ):
        """Interpolated signed distance (reference models/mesh_grid.py:88-144).

        Returns (distance (..., 1), indices (..., K), weights (..., K));
        indices/weights are non-differentiable, distance is analytic in xyz
        and in the indicator parameters.
        """
        sq, indices = self.knn(xyz, K)
        weights = interp.knn_weights(sq)
        ind_vec = (self.vertex_normals if indicator_vector is None
                   else indicator_vector)
        distance = interp.interpolated_distance(
            xyz, self.vertices, indices, weights, ind_vec, indicator_weight)
        return distance, indices, weights

    # ------------------------------------------------------------------
    def cast_ray(self, rays_o: np.ndarray, rays_d: np.ndarray):
        """Host-side mesh ray casting (reference models/mesh_grid.py:26-39;
        used only in offline editing preprocessing). Returns
        (t_hit (N,), primitive_ids (N,)) with inf / INVALID_ID for misses."""
        from .raycast import cast_rays
        return cast_rays(self.mesh, np.asarray(rays_o), np.asarray(rays_d))

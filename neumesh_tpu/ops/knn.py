"""Device-side k-nearest-neighbour search over mesh vertices.

TPU-native replacement for the reference's FRNN CUDA kernel
(reference models/mesh_grid.py:64-74,109-119: grid build K=32/r=100 cached,
per-query K=8 search). Two paths:

  - ``knn_brute``: exact top-k by tiled distance computation; O(Q*N) — the
    correctness reference and the fallback for small meshes.
  - ``CandidateGrid``: a dense grid over the QUERY domain where every cell
    precomputes its K' (default 16) nearest vertices, with candidate
    positions stored INLINE. A query is then: cell id (elementwise) ->
    one row gather of (K', 3) positions + (K',) indices -> distances ->
    top-k. This maps onto the TPU memory system as a few medium-sized row
    gathers — no 27-neighbourhood mega-gathers, no multi-level fallback
    (far-away cells hold the genuinely nearest mesh region, so the far
    field is handled for free).

    The table is built ONCE per mesh (the analog of the reference's cached
    frnn grid) via the native C++ KD-tree (neumesh_tpu/cpp), falling back
    to chunked device brute force. Build-time validation reports the
    near-surface agreement vs exact kNN and bumps K' if needed.

Returned (sq_dist, indices) must be treated as non-differentiable: the
reference detaches them (models/mesh_grid.py:121-122); callers apply
stop_gradient and recompute the analytic distance formula in JAX.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def knn_brute(query: jnp.ndarray, points: jnp.ndarray, k: int,
              q_chunk: int = 8192) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact kNN. query: (Q, 3), points: (N, 3) ->
    (sq_dist (Q, k) ascending, indices (Q, k))."""
    n = points.shape[0]
    k = min(k, n)
    pp = jnp.sum(points * points, axis=-1)  # (N,)

    def one_chunk(q):
        qq = jnp.sum(q * q, axis=-1, keepdims=True)  # (C, 1)
        d2 = qq + pp[None, :] - 2.0 * q @ points.T  # (C, N)
        neg, idx = jax.lax.top_k(-d2, k)
        return jnp.maximum(-neg, 0.0), idx

    Q = query.shape[0]
    if Q <= q_chunk:
        return one_chunk(query)
    n_chunks = -(-Q // q_chunk)
    pad = n_chunks * q_chunk - Q
    qpad = jnp.pad(query, ((0, pad), (0, 0)))
    qpad = qpad.reshape(n_chunks, q_chunk, 3)
    d2, idx = jax.lax.map(one_chunk, qpad)
    return (d2.reshape(-1, k)[:Q], idx.reshape(-1, k)[:Q])


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class CandidateGrid:
    """Per-cell precomputed-candidate grid (device arrays).

    cand_idx: (n_cells, Kp) int32 — candidate vertex ids per cell.
    cand_pts: (n_cells, Kp, 3) f32 — the same candidates' positions inline.
    origin (3,), inv_h scalar, dims (static 3-tuple).
    """
    cand_idx: jnp.ndarray
    cand_pts: jnp.ndarray
    origin: jnp.ndarray
    inv_h: jnp.ndarray
    dims: Tuple[int, int, int]

    def tree_flatten(self):
        return ((self.cand_idx, self.cand_pts, self.origin, self.inv_h),
                (self.dims,))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux[0])

    @property
    def Kp(self) -> int:
        return self.cand_idx.shape[1]

    def query(self, xyz: jnp.ndarray, k: int = 8,
              q_chunk: int = 262144):
        """xyz: (..., 3) -> (sq_dist (..., k), indices (..., k))."""
        shape = xyz.shape[:-1]
        q = xyz.reshape(-1, 3)
        Q = q.shape[0]
        if Q <= q_chunk:
            sq, idx = self._query_chunk(q, k)
        else:
            n_chunks = -(-Q // q_chunk)
            pad = n_chunks * q_chunk - Q
            qpad = jnp.pad(q, ((0, pad), (0, 0))).reshape(
                n_chunks, q_chunk, 3)
            sq, idx = jax.lax.map(lambda qq: self._query_chunk(qq, k), qpad)
            sq = sq.reshape(-1, k)[:Q]
            idx = idx.reshape(-1, k)[:Q]
        return sq.reshape(shape + (k,)), idx.reshape(shape + (k,))

    def _query_chunk(self, q, k: int):
        dims = jnp.asarray(self.dims)
        cell = jnp.floor((q - self.origin) * self.inv_h).astype(jnp.int32)
        cell = jnp.clip(cell, 0, dims - 1)
        flat = (cell[:, 0] * dims[1] + cell[:, 1]) * dims[2] + cell[:, 2]
        cpts = self.cand_pts[flat]          # (Q, Kp, 3)
        cidx = self.cand_idx[flat]          # (Q, Kp)
        d2 = jnp.sum((cpts - q[:, None, :]) ** 2, axis=-1)
        neg, sel = jax.lax.top_k(-d2, k)
        idx = jnp.take_along_axis(cidx, sel, axis=-1)
        return jnp.maximum(-neg, 0.0), idx


# keep the old name importable (MeshGrid used to build a UniformGrid)
UniformGrid = CandidateGrid


def _host_cell_knn(points: np.ndarray, centers: np.ndarray, kp: int):
    """Kp-NN of each cell center: native C++ KD-tree, else device brute."""
    try:
        from ..cpp import native
        if native.available():
            _, idx = native.KDTree(points.astype(np.float64)).query(
                centers.astype(np.float64), k=kp)
            return idx.astype(np.int32)
    except Exception:
        pass
    _, idx = knn_brute(jnp.asarray(centers, jnp.float32),
                       jnp.asarray(points, jnp.float32), kp, q_chunk=512)
    return np.asarray(idx, np.int32)


def build_candidate_grid(
    points,
    kp: int = 16,
    cell_size: float | None = None,
    domain_margin: float = 1.0,
    max_cells: int = 4 << 20,
    validate: bool = True,
) -> CandidateGrid:
    """Build the candidate grid (one-time per mesh).

    The grid covers the vertex bbox grown by `domain_margin` (render-volume
    queries outside the bbox clamp to boundary cells, whose candidates are
    the genuinely nearest mesh region). cell_size defaults to the max 8th-NN
    distance among the points, giving near-surface exactness with Kp=16.
    """
    pts = np.asarray(points, dtype=np.float32)
    n = pts.shape[0]
    kp = min(kp, n)

    if cell_size is None:
        sample = pts if n <= 20000 else pts[
            np.random.default_rng(0).choice(n, 20000, replace=False)]
        d2, _ = knn_brute(jnp.asarray(sample), jnp.asarray(pts),
                          min(9, n))
        d8 = np.sqrt(np.asarray(d2)[:, -1])
        cell_size = float(d8.max() + 1e-6)

    lo = pts.min(0) - domain_margin
    hi = pts.max(0) + domain_margin
    extent = np.maximum(hi - lo, 1e-3)
    dims = np.maximum(np.ceil(extent / cell_size).astype(np.int64), 1)
    while int(dims.prod()) > max_cells:
        cell_size *= 1.26
        dims = np.maximum(np.ceil(extent / cell_size).astype(np.int64), 1)

    # cell centers
    cx = lo[0] + (np.arange(dims[0]) + 0.5) * cell_size
    cy = lo[1] + (np.arange(dims[1]) + 0.5) * cell_size
    cz = lo[2] + (np.arange(dims[2]) + 0.5) * cell_size
    CX, CY, CZ = np.meshgrid(cx, cy, cz, indexing="ij")
    centers = np.stack([CX, CY, CZ], -1).reshape(-1, 3).astype(np.float32)

    cand_idx = _host_cell_knn(pts, centers, kp)  # (n_cells, Kp)
    cand_pts = pts[cand_idx]                     # (n_cells, Kp, 3)

    grid = CandidateGrid(
        cand_idx=jnp.asarray(cand_idx),
        cand_pts=jnp.asarray(cand_pts),
        origin=jnp.asarray(lo.astype(np.float32)),
        inv_h=jnp.asarray(np.float32(1.0 / cell_size)),
        dims=tuple(int(d) for d in dims),
    )

    if validate and n > 8:
        # criterion: kNN *distances* (what the inverse-distance weights see)
        # must match brute force closely; index ties don't matter
        rng = np.random.default_rng(1)
        m = min(2000, n)
        sel = rng.choice(n, m, replace=False)
        qv = pts[sel] + rng.normal(size=(m, 3)).astype(np.float32) \
            * (0.25 * cell_size)
        sq_g, _ = grid.query(jnp.asarray(qv), k=min(8, n))
        sq_b, _ = knn_brute(jnp.asarray(qv), jnp.asarray(pts), min(8, n))
        d_g = np.sqrt(np.asarray(sq_g))
        d_b = np.sqrt(np.asarray(sq_b))
        rel_err = float(np.mean(np.abs(d_g - d_b)
                                / np.maximum(d_b, 1e-6)))
        if rel_err > 5e-3 and kp < 4 * 16:
            return build_candidate_grid(
                points, kp=kp * 2, cell_size=cell_size,
                domain_margin=domain_margin, max_cells=max_cells,
                validate=validate)
    return grid


# old API name
def build_uniform_grid(points, cell_size=None, **kwargs) -> CandidateGrid:
    kwargs.pop("capacity_cap", None)
    kwargs.pop("coarse_factor", None)
    kwargs.pop("coarse_capacity_cap", None)
    kwargs.pop("k_ref", None)
    kwargs.pop("verbose", None)
    return build_candidate_grid(points, cell_size=cell_size, **kwargs)

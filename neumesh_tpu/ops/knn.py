"""Device-side k-nearest-neighbour search over mesh vertices.

TPU-native replacement for the reference's FRNN CUDA kernel
(reference models/mesh_grid.py:64-74,109-119: grid build K=32/r=100 cached,
per-query K=8 search). Two paths:

  - ``knn_brute``: exact top-k by tiled distance computation; O(Q*N) — the
    correctness reference and the fallback for small meshes.
  - ``UniformGrid``: counting-sort uniform grid with a *padded dense cell
    table*; each query gathers its 27-neighbourhood candidates and top-k's
    them. Cell size is derived from the mesh's own 8th-NN distances so that
    any query within ~one cell of the surface finds its true k NN. Queries
    whose fine neighbourhood holds fewer than k points fall back (per query,
    via jnp.where) to a coarse level, preserving the far-field behaviour
    that matters: the interpolated distance grows large positive
    (see ops/interp.py).

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
class UniformGrid:
    """Padded-cell uniform grid over a fixed point set (device arrays).

    points_ext: (N + 1, 3) — the point set plus a far-away sentinel row used
        to pad cells; padded slots resolve to huge distances and lose top-k
        whenever real neighbours exist.
    cell_table / coarse_table: (n_cells, C) int32 candidate indices.
    """
    points_ext: jnp.ndarray
    cell_table: jnp.ndarray
    coarse_table: jnp.ndarray
    origin: jnp.ndarray          # (3,)
    # static:
    h: float
    dims: Tuple[int, int, int]
    coarse_h: float
    coarse_dims: Tuple[int, int, int]

    def tree_flatten(self):
        children = (self.points_ext, self.cell_table, self.coarse_table,
                    self.origin)
        aux = (self.h, self.dims, self.coarse_h, self.coarse_dims)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    # ------------------------------------------------------------------
    @property
    def n_points(self) -> int:
        return self.points_ext.shape[0] - 1

    def query(self, xyz: jnp.ndarray, k: int = 8, q_chunk: int = 8192):
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
        sentinel = self.n_points

        def level(origin, h, dims, table):
            cand = self._gather27(q, origin, h, dims, table)  # (Q, 27C)
            pts = self.points_ext[cand]
            d2 = jnp.sum((pts - q[:, None, :]) ** 2, axis=-1)
            n_real = jnp.sum(cand != sentinel, axis=-1)  # (Q,)
            neg, sel = jax.lax.top_k(-d2, k)
            idx = jnp.take_along_axis(cand, sel, axis=-1)
            return jnp.maximum(-neg, 0.0), idx, n_real

        sq_f, idx_f, n_f = level(self.origin, self.h, self.dims,
                                 self.cell_table)
        sq_c, idx_c, _ = level(self.origin, self.coarse_h, self.coarse_dims,
                               self.coarse_table)
        use_fine = (n_f >= k)[:, None]
        return (jnp.where(use_fine, sq_f, sq_c),
                jnp.where(use_fine, idx_f, idx_c))

    def _gather27(self, q, origin, h, dims, table):
        """Candidate indices from the 27-cell neighbourhood of each query.
        Out-of-range neighbour cells map to an all-sentinel row (clipping
        them instead would duplicate boundary cells and corrupt top-k)."""
        dims = jnp.asarray(dims)
        n_cells = table.shape[0]
        cell = jnp.floor((q - origin) / h).astype(jnp.int32)  # (Q, 3)
        # clamp the query's own cell so off-grid queries still search the
        # nearest boundary cells
        cell = jnp.clip(cell, 0, dims - 1)
        offsets = jnp.stack(jnp.meshgrid(
            jnp.arange(-1, 2), jnp.arange(-1, 2), jnp.arange(-1, 2),
            indexing="ij"), axis=-1).reshape(27, 3)
        nbr = cell[:, None, :] + offsets[None, :, :]  # (Q, 27, 3)
        valid = jnp.all((nbr >= 0) & (nbr < dims), axis=-1)  # (Q, 27)
        flat = (nbr[..., 0] * dims[1] + nbr[..., 1]) * dims[2] + nbr[..., 2]
        flat = jnp.where(valid, flat, n_cells)
        sentinel_row = jnp.full(
            (1, table.shape[1]), self.n_points, dtype=table.dtype)
        table_ext = jnp.concatenate([table, sentinel_row], axis=0)
        return table_ext[flat].reshape(q.shape[0], -1)  # (Q, 27*C)


def _build_table(points: np.ndarray, origin: np.ndarray, h: float,
                 dims: np.ndarray, capacity_cap: int, sentinel: int):
    """Host-side counting sort into a padded dense cell table."""
    cell = np.floor((points - origin) / h).astype(np.int64)
    cell = np.clip(cell, 0, dims - 1)
    flat = (cell[:, 0] * dims[1] + cell[:, 1]) * dims[2] + cell[:, 2]
    n_cells = int(dims[0] * dims[1] * dims[2])
    counts = np.bincount(flat, minlength=n_cells)
    C = int(min(max(counts.max(), 1), capacity_cap))
    table = np.full((n_cells, C), sentinel, dtype=np.int32)
    order = np.argsort(flat, kind="stable")
    sorted_flat = flat[order]
    start = np.zeros(n_cells + 1, dtype=np.int64)
    start[1:] = np.cumsum(counts)
    within = np.arange(len(points)) - start[sorted_flat]
    keep = within < C
    table[sorted_flat[keep], within[keep]] = order[keep].astype(np.int32)
    overflow = int((~keep).sum())
    return table, C, overflow


def build_uniform_grid(
    points,
    cell_size: float | None = None,
    capacity_cap: int = 64,
    coarse_factor: int = 4,
    coarse_capacity_cap: int = 96,
    k_ref: int = 8,
    verbose: bool = False,
) -> UniformGrid:
    """Build the two-level grid (host-side, one-time per mesh — the analog of
    the reference's cached frnn grid, models/mesh_grid.py:64-74).

    cell_size defaults to 1.5x the max 8th-NN distance among the points
    themselves, which makes near-surface queries exact (their true 8 NN lie
    within one cell length, hence inside the 27-cell neighbourhood).
    """
    pts = np.asarray(points, dtype=np.float32)
    n = pts.shape[0]
    if cell_size is None:
        # sample for large meshes; the max is stable under sampling because
        # vertex spacing is locally uniform in marching-cubes meshes
        sample = pts if n <= 20000 else pts[
            np.random.default_rng(0).choice(n, 20000, replace=False)]
        d2, _ = knn_brute(jnp.asarray(sample), jnp.asarray(pts),
                          min(k_ref + 1, n))
        d8 = np.sqrt(np.asarray(d2)[:, -1])
        cell_size = float(d8.max() * 1.5 + 1e-6)

    lo = pts.min(0) - 1e-4
    hi = pts.max(0) + 1e-4
    extent = np.maximum(hi - lo, 1e-3)
    dims = np.maximum(np.ceil(extent / cell_size).astype(np.int64), 1)
    # keep the fine table under ~64M entries
    while int(dims.prod()) * capacity_cap > (1 << 26):
        cell_size *= 1.26
        dims = np.maximum(np.ceil(extent / cell_size).astype(np.int64), 1)

    sentinel = n
    table_f, Cf, overflow_f = _build_table(
        pts, lo, cell_size, dims, capacity_cap, sentinel)

    ch = cell_size * coarse_factor
    cdims = np.maximum(np.ceil(extent / ch).astype(np.int64), 1)
    table_c, Cc, overflow_c = _build_table(
        pts, lo, ch, cdims, coarse_capacity_cap, sentinel)

    if verbose and (overflow_f or overflow_c):
        print(f"[knn] cell overflow: fine={overflow_f} coarse={overflow_c} "
              f"(capacities {Cf}/{Cc}) — kNN may be approximate in dense "
              f"regions")

    points_ext = np.concatenate(
        [pts, np.full((1, 3), 1e9, np.float32)], axis=0)

    return UniformGrid(
        points_ext=jnp.asarray(points_ext),
        cell_table=jnp.asarray(table_f),
        coarse_table=jnp.asarray(table_c),
        origin=jnp.asarray(lo.astype(np.float32)),
        h=float(cell_size),
        dims=tuple(int(d) for d in dims),
        coarse_h=float(ch),
        coarse_dims=tuple(int(d) for d in cdims),
    )

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
        # precision='highest': TPU f32 matmuls default to bf16 MXU inputs,
        # whose ~1e-2 error destroys the |q|^2+|p|^2-2qp cancellation
        d2 = qq + pp[None, :] - 2.0 * jnp.dot(
            q, points.T, precision="highest")        # (C, N)
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
    """Two-level per-cell precomputed-candidate grid (device arrays).

    Candidate LISTS are stored only for near-surface cells (deduplicated
    ROWS); a dense per-cell int32 map points every cell at its row — far
    cells share the row of their nearest near-surface cell (EDT), which
    previously DUPLICATED whole (Kp,)/(Kp, 3) lists per far cell. At
    production mesh scale (163k vertices) the flat layout was 420 MB of
    cand_idx + 1.3 GB of cand_pts; the two-level layout is ~8 MB of map +
    tables proportional to the surface area.

    cell_row: (n_cells,) int32 — candidate-row id per grid cell.
    cand_idx: (n_rows, Kp) int32 — candidate vertex ids per ROW.
    cand_pts: (n_rows, Kp, 3) f32 — the same candidates' positions inline.
    origin (3,), inv_h scalar, dims (static 3-tuple).
    """
    cell_row: jnp.ndarray
    cand_idx: jnp.ndarray
    cand_pts: object            # host numpy (stays numpy: stable pytree)
    origin: jnp.ndarray
    inv_h: jnp.ndarray
    dims: Tuple[int, int, int]

    def tree_flatten(self):
        # cand_pts is returned AS BUILT (host numpy): registered leaves
        # must never change type across calls, or jit sees a different
        # closure/argument signature per call (recompile + staleness
        # hazard). The device copy lives in the _pts_dev cache attribute,
        # deliberately OUTSIDE the pytree.
        return ((self.cell_row, self.cand_idx, self.cand_pts, self.origin,
                 self.inv_h), (self.dims,))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux[0])

    def _pts_device(self):
        """Device-resident candidate positions; transferred on first use.
        The ray-context path only needs cand_idx, so keeping cand_pts on
        the host avoids shipping the biggest table to the accelerator
        unless the per-sample query path actually runs. The transfer is
        cached in a non-pytree attribute; self.cand_pts is never
        mutated."""
        dev = self.__dict__.get("_pts_dev")
        if dev is None:
            dev = jnp.asarray(np.asarray(self.cand_pts))
            self.__dict__["_pts_dev"] = dev
        return dev

    @property
    def Kp(self) -> int:
        return self.cand_idx.shape[1]

    def cell_candidates(self, flat_cell) -> jnp.ndarray:
        """Candidate vertex ids for flat cell ids: (...,) -> (..., Kp).
        Two gathers: a tiny int row lookup, then the (Kp,) id rows."""
        return self.cand_idx[self.cell_row[flat_cell]]

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
        row = self.cell_row[flat]           # (Q,)
        cpts = self._pts_device()[row]      # (Q, Kp, 3)
        cidx = self.cand_idx[row]           # (Q, Kp)
        d2 = jnp.sum((cpts - q[:, None, :]) ** 2, axis=-1)
        neg, sel = jax.lax.top_k(-d2, k)
        idx = jnp.take_along_axis(cidx, sel, axis=-1)
        return jnp.maximum(-neg, 0.0), idx


# keep the old name importable (MeshGrid used to build a UniformGrid)
UniformGrid = CandidateGrid


def _host_knn(points: np.ndarray, queries: np.ndarray, kp: int):
    """Kp-NN on host: native C++ KD-tree (threaded), else device brute.
    Returns (dist (Q, kp), idx (Q, kp))."""
    try:
        from ..cpp import native
        if native.available():
            d, idx = native.KDTree(points.astype(np.float64)).query(
                queries.astype(np.float64), k=kp)
            return d, idx.astype(np.int32)
    except Exception:
        pass
    sq, idx = knn_brute(jnp.asarray(queries, jnp.float32),
                        jnp.asarray(points, jnp.float32), kp, q_chunk=512)
    return np.sqrt(np.asarray(sq)), np.asarray(idx, np.int32)


def _grid_cache_path(points: np.ndarray, kp: int, cell_size,
                     domain_margin: float) -> str:
    import hashlib
    import os
    h = hashlib.sha1()
    h.update(np.ascontiguousarray(points, np.float32).tobytes())
    h.update(f"{kp}|{cell_size}|{domain_margin}|v5".encode())
    cache_dir = os.environ.get(
        "NEUMESH_GRID_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "neumesh_tpu"))
    os.makedirs(cache_dir, exist_ok=True)
    return os.path.join(cache_dir, f"grid_{h.hexdigest()[:20]}.npz")


def build_candidate_grid(
    points,
    kp: int = 24,
    cell_size: float | None = None,
    domain_margin: float | None = None,
    max_cells: int = 2 << 20,
    validate: bool = True,
    use_cache: bool = True,
) -> CandidateGrid:
    """Build the two-level candidate grid (one-time per mesh).

    The grid covers the vertex bbox grown by `domain_margin` (queries
    outside the bbox clamp per-coordinate to boundary cells — i.e. to the
    closest bbox point — whose rows hold the genuinely nearest mesh
    region; default margin: 3 cells, since a larger margin only inflates
    the dense cell map without changing which candidates far queries
    see). cell_size defaults to the 90th-pct 8th-NN distance among the
    points, giving near-surface exactness with modest Kp; build-time
    validation doubles Kp until the kNN distances match exact search.
    """
    pts = np.asarray(points, dtype=np.float32)
    n = pts.shape[0]
    kp = min(kp, n)

    cache_path = None
    if use_cache and n > 5000:
        cache_path = _grid_cache_path(pts, kp, cell_size, domain_margin)
        import os
        if os.path.exists(cache_path):
            try:
                z = np.load(cache_path)
                return CandidateGrid(
                    cell_row=jnp.asarray(z["cell_row"]),
                    cand_idx=jnp.asarray(z["cand_idx"]),
                    cand_pts=z["cand_pts"],
                    origin=jnp.asarray(z["origin"]),
                    inv_h=jnp.asarray(z["inv_h"]),
                    dims=tuple(int(x) for x in z["dims"]),
                )
            except Exception:
                pass

    if cell_size is None:
        # 90th-percentile 8th-NN distance (outlier-robust), shrunk so that
        # kp~24 candidate lists cover any query inside the cell
        sample = pts if n <= 20000 else pts[
            np.random.default_rng(0).choice(n, 20000, replace=False)]
        d, _ = _host_knn(pts, sample, min(9, n))
        d8 = d[:, -1]
        cell_size = float(np.percentile(d8, 90) + 1e-6)

    margin = (3.0 * cell_size if domain_margin is None
              else float(domain_margin))
    lo = pts.min(0) - margin
    hi = pts.max(0) + margin
    extent = np.maximum(hi - lo, 1e-3)
    dims = np.maximum(np.ceil(extent / cell_size).astype(np.int64), 1)
    while int(dims.prod()) > max_cells:
        cell_size *= 1.26
        margin = (3.0 * cell_size if domain_margin is None
                  else float(domain_margin))
        lo = pts.min(0) - margin
        hi = pts.max(0) + margin
        extent = np.maximum(hi - lo, 1e-3)
        dims = np.maximum(np.ceil(extent / cell_size).astype(np.int64), 1)

    # ---- candidate lists per cell.
    # Exact Kp-NN queries only for cells NEAR the point set (occupancy
    # dilated by one cell); every far cell inherits the list of its nearest
    # near-surface cell via an EDT feature transform — an excellent
    # approximation (direction to the surface dominates far kNN) that cuts
    # the KD-tree work by ~30x. Single-core host builds finish in seconds.
    from scipy import ndimage

    cell_of = np.floor((pts - lo) / cell_size).astype(np.int64)
    cell_of = np.clip(cell_of, 0, dims - 1)
    occ = np.zeros(tuple(dims), bool)
    occ[cell_of[:, 0], cell_of[:, 1], cell_of[:, 2]] = True
    near_mask = ndimage.binary_dilation(occ, iterations=2)

    near_ijk = np.argwhere(near_mask)            # (M, 3)
    centers_near = (lo + (near_ijk + 0.5) * cell_size).astype(np.float32)
    _, cand_near = _host_knn(pts, centers_near, kp)   # (M, Kp)

    # nearest near-cell for every cell (feature transform): foreground =
    # far cells, scipy returns the index of the nearest background (= near)
    edt_idx = ndimage.distance_transform_edt(
        ~near_mask, return_distances=False, return_indices=True)
    src_ijk = np.stack([edt_idx[0], edt_idx[1], edt_idx[2]], -1)  # (...,3)
    # map (i,j,k) of the source near-cell to its row in cand_near; far
    # cells POINT AT their source's row (two-level) instead of copying it
    near_row = np.full(tuple(dims), -1, np.int64)
    near_row[near_ijk[:, 0], near_ijk[:, 1], near_ijk[:, 2]] = \
        np.arange(len(near_ijk))
    cell_row = near_row[src_ijk[..., 0], src_ijk[..., 1],
                        src_ijk[..., 2]].reshape(-1)   # (n_cells,)
    cand_pts = pts[cand_near]                    # (n_rows, Kp, 3)

    grid = CandidateGrid(
        cell_row=jnp.asarray(cell_row.astype(np.int32)),
        cand_idx=jnp.asarray(cand_near.astype(np.int32)),
        cand_pts=np.ascontiguousarray(cand_pts),
        origin=jnp.asarray(lo.astype(np.float32)),
        inv_h=jnp.asarray(np.float32(1.0 / cell_size)),
        dims=tuple(int(d) for d in dims),
    )

    if validate and n > 8:
        # criterion: kNN *distances* (what the inverse-distance weights see)
        # must match exact search closely; index ties don't matter.
        # Host-side (KD-tree) — the build never touches the accelerator.
        rng = np.random.default_rng(1)
        m = min(2000, n)
        sel = rng.choice(n, m, replace=False)
        qv = pts[sel] + rng.normal(size=(m, 3)).astype(np.float32) \
            * (0.25 * cell_size)
        sq_g, _ = grid.query(jnp.asarray(qv), k=min(8, n))
        d_g = np.sqrt(np.asarray(sq_g))
        d_b, _ = _host_knn(pts, qv, min(8, n))
        rel_err = float(np.mean(np.abs(d_g - d_b)
                                / np.maximum(d_b, 1e-6)))
        if rel_err > 5e-3 and kp < 96:
            return build_candidate_grid(
                points, kp=kp * 2, cell_size=cell_size,
                domain_margin=domain_margin, max_cells=max_cells,
                validate=validate, use_cache=use_cache)

    if cache_path is not None:
        try:
            np.savez(cache_path,
                     cell_row=np.asarray(grid.cell_row),
                     cand_idx=np.asarray(grid.cand_idx),
                     cand_pts=np.asarray(grid.cand_pts),
                     origin=np.asarray(grid.origin),
                     inv_h=np.asarray(grid.inv_h),
                     dims=np.asarray(grid.dims))
        except Exception:
            pass
    return grid


# old API name
def build_uniform_grid(points, cell_size=None, **kwargs) -> CandidateGrid:
    kwargs.pop("capacity_cap", None)
    kwargs.pop("coarse_factor", None)
    kwargs.pop("coarse_capacity_cap", None)
    kwargs.pop("k_ref", None)
    kwargs.pop("verbose", None)
    return build_candidate_grid(points, cell_size=cell_size, **kwargs)

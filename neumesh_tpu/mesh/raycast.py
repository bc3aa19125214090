"""Host-side mesh ray casting (Open3D RaycastingScene analog; reference
models/mesh_grid.py:22-39). Used in offline editing preprocessing — finding
paint-touched vertices (reference editing/paint.py:34-52).

Uses the native C++ BVH when available; falls back to a chunked
numpy Moller-Trumbore over all triangles.
"""
from __future__ import annotations

import numpy as np

from .triangle_mesh import TriangleMesh

INVALID_ID = -1


def cast_rays(mesh: TriangleMesh, rays_o: np.ndarray, rays_d: np.ndarray):
    """Returns (t_hit (N,), primitive_ids (N,)); inf / -1 on miss."""
    try:
        from ..cpp import native
        if native.available():
            bvh = native.BVH(mesh.vertices, mesh.triangles)
            return bvh.cast(rays_o, rays_d)
    except Exception:
        pass
    return _cast_rays_numpy(mesh, rays_o, rays_d)


def _cast_rays_numpy(mesh: TriangleMesh, rays_o, rays_d,
                     ray_chunk: int = 512):
    v = mesh.vertices
    t = mesh.triangles
    p0 = v[t[:, 0]]
    e1 = v[t[:, 1]] - p0
    e2 = v[t[:, 2]] - p0
    n = len(rays_o)
    t_hit = np.full(n, np.inf)
    prim = np.full(n, INVALID_ID, dtype=np.int64)
    for s in range(0, n, ray_chunk):
        o = rays_o[s:s + ray_chunk][:, None, :]     # (R, 1, 3)
        d = rays_d[s:s + ray_chunk][:, None, :]
        pv = np.cross(d, e2[None])                  # (R, M, 3)
        det = np.sum(e1[None] * pv, -1)
        inv = 1.0 / np.where(np.abs(det) < 1e-14, 1e-14, det)
        tv = o - p0[None]
        u = np.sum(tv * pv, -1) * inv
        qv = np.cross(tv, e1[None])
        w = np.sum(d * qv, -1) * inv
        tt = np.sum(e2[None] * qv, -1) * inv
        ok = ((np.abs(det) > 1e-14) & (u >= -1e-9) & (u <= 1 + 1e-9)
              & (w >= -1e-9) & (u + w <= 1 + 1e-9) & (tt > 1e-12))
        tt = np.where(ok, tt, np.inf)
        best = np.argmin(tt, axis=1)
        best_t = tt[np.arange(len(best)), best]
        hit = np.isfinite(best_t)
        t_hit[s:s + ray_chunk] = best_t
        prim[s:s + ray_chunk] = np.where(hit, best, INVALID_ID)
    return t_hit, prim

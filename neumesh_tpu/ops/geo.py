"""Geometry helpers (reference utils/geo_util.py).

Barycentric coordinates of points projected onto triangles (Heidrich's
method, reference geo_util.py:10-46) and affine transforms for vertices /
directions (reference geo_util.py:52-89). Numpy + jnp compatible (pure
array ops).
"""
from __future__ import annotations

import numpy as np


def barycentric_coordinates(p, a, b, c):
    """Barycentric coords of p projected on triangle (a, b, c).
    All inputs (..., 3); returns (..., 3) = (u, v, w) with
    p ~ u*a + v*b + w*c (Heidrich 2005)."""
    ab = b - a
    ac = c - a
    ap = p - a
    n = np.cross(ab, ac)
    n_norm2 = (n * n).sum(-1, keepdims=True)
    n_norm2 = np.where(n_norm2 < 1e-20, 1e-20, n_norm2)
    v = (np.cross(ab, ap) * n).sum(-1, keepdims=True) / n_norm2
    w = (np.cross(ap, ac) * n).sum(-1, keepdims=True) / n_norm2
    u = 1.0 - v - w
    # NOTE: (u, v, w) multiply (a, b, c) in this order:
    # p' = u a + w b + v c per Heidrich's derivation with this cross order
    return np.concatenate([u, w, v], axis=-1)


def transform_vertices(R, t, vertices):
    """(3,3) rotation(+scale) and (3,) translation applied to (..., 3)."""
    return vertices @ np.asarray(R).T + np.asarray(t)


def transform_direction(R, directions):
    """Rotate directions (no translation); R may include scale — the result
    is NOT re-normalised (matches reference geo_util.py usage)."""
    return directions @ np.asarray(R).T

"""ctypes loader for the native host-geometry library (libneumesh_host.so).

The library provides the C++ equivalents of the reference's native deps
(SURVEY §2.4): marching tetrahedra (PyMCubes), KD-tree kNN (scipy cKDTree),
BVH ray casting (Open3D RaycastingScene), and ARAP deformation (Open3D).
Built lazily with g++ on first use; every caller has a numpy fallback, so a
missing toolchain degrades gracefully.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LIB = None
_LOCK = threading.Lock()
_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libneumesh_host.so")
_SRC = os.path.join(_DIR, "src", "host_lib.cpp")


def _build() -> bool:
    if not os.path.exists(_SRC):
        return False
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-o", _SO, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except Exception:
        return False


def _load():
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if not os.path.exists(_SO) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        _configure(lib)
        _LIB = lib
        return _LIB


def _configure(lib):
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")

    lib.mt_extract.restype = ctypes.c_longlong
    lib.mt_extract.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ctypes.POINTER(ctypes.c_void_p)]
    lib.mt_get_results.restype = None
    lib.mt_get_results.argtypes = [
        ctypes.c_void_p, f64p, i64p]
    lib.mt_free.restype = None
    lib.mt_free.argtypes = [ctypes.c_void_p]
    lib.mt_num_tris.restype = ctypes.c_longlong
    lib.mt_num_tris.argtypes = [ctypes.c_void_p]

    lib.mc_extract.restype = ctypes.c_longlong
    lib.mc_extract.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ctypes.POINTER(ctypes.c_void_p)]
    lib.mc_get_results.restype = None
    lib.mc_get_results.argtypes = [ctypes.c_void_p, f64p, i64p]
    lib.mc_free.restype = None
    lib.mc_free.argtypes = [ctypes.c_void_p]
    lib.mc_num_tris.restype = ctypes.c_longlong
    lib.mc_num_tris.argtypes = [ctypes.c_void_p]

    lib.kdtree_build.restype = ctypes.c_void_p
    lib.kdtree_build.argtypes = [f64p, ctypes.c_longlong]
    lib.kdtree_free.restype = None
    lib.kdtree_free.argtypes = [ctypes.c_void_p]
    lib.kdtree_knn.restype = None
    lib.kdtree_knn.argtypes = [
        ctypes.c_void_p, f64p, ctypes.c_longlong, ctypes.c_int, i64p, f64p]

    lib.bvh_build.restype = ctypes.c_void_p
    lib.bvh_build.argtypes = [f64p, ctypes.c_longlong, i64p,
                              ctypes.c_longlong]
    lib.bvh_free.restype = None
    lib.bvh_free.argtypes = [ctypes.c_void_p]
    lib.bvh_cast.restype = None
    lib.bvh_cast.argtypes = [
        ctypes.c_void_p, f64p, f64p, ctypes.c_longlong, f64p, i64p]

    lib.arap_deform.restype = ctypes.c_int
    lib.arap_deform.argtypes = [
        f64p, ctypes.c_longlong, i64p, ctypes.c_longlong,
        i64p, f64p, ctypes.c_longlong, ctypes.c_int, f64p]


def available() -> bool:
    return _load() is not None


# ---------------------------------------------------------------------------
def _extract_iso(field: np.ndarray, iso: float, prefix: str):
    lib = _load()
    assert lib is not None
    nx, ny, nz = field.shape
    # the C++ extractors dedup crossed edges with a (lo<<32)|hi packed key
    # (host_lib.cpp) — silently corrupt once the grid has >= 2^32 vertices
    # (ADVICE r4: fail loudly instead)
    if nx * ny * nz >= 2**32:
        raise ValueError(
            f"{prefix}_extract: grid {nx}x{ny}x{nz} has >= 2^32 vertices; "
            "the packed edge-dedup key would collide (split the grid)")
    handle = ctypes.c_void_p()
    n_verts = getattr(lib, prefix + "_extract")(
        np.ascontiguousarray(field, np.float32), nx, ny, nz,
        ctypes.c_float(iso), ctypes.byref(handle))
    if n_verts < 0:
        raise RuntimeError(prefix + "_extract failed")
    n_tris = getattr(lib, prefix + "_num_tris")(handle)
    verts = np.empty((n_verts, 3), np.float64)
    tris = np.empty((n_tris, 3), np.int64)
    if n_verts:
        getattr(lib, prefix + "_get_results")(handle, verts, tris)
    getattr(lib, prefix + "_free")(handle)
    return verts, tris


def marching_tetrahedra(field: np.ndarray, iso: float):
    return _extract_iso(field, iso, "mt")


def marching_cubes(field: np.ndarray, iso: float):
    """Classic marching cubes (one vertex per crossed grid edge) — the
    PyMCubes-comparable vertex set (reference extract_mesh.py:139)."""
    return _extract_iso(field, iso, "mc")


class KDTree:
    """Exact kNN over a fixed point set (cKDTree analog, used by the editing
    suite's feature transfer; reference editing/render_texture_swapping.py:217)."""

    def __init__(self, points: np.ndarray):
        self._lib = _load()
        assert self._lib is not None
        self._pts = np.ascontiguousarray(points, np.float64)
        self._h = self._lib.kdtree_build(self._pts, len(self._pts))

    def query(self, q: np.ndarray, k: int = 1):
        q = np.ascontiguousarray(q, np.float64)
        n = len(q)
        idx = np.empty((n, k), np.int64)
        dist = np.empty((n, k), np.float64)
        self._lib.kdtree_knn(self._h, q, n, k, idx, dist)
        return dist, idx

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.kdtree_free(self._h)
        except Exception:
            pass


class BVH:
    """Ray-triangle casting (Open3D RaycastingScene analog; reference
    models/mesh_grid.py:22-39)."""

    def __init__(self, vertices: np.ndarray, triangles: np.ndarray):
        self._lib = _load()
        assert self._lib is not None
        self._v = np.ascontiguousarray(vertices, np.float64)
        self._t = np.ascontiguousarray(triangles, np.int64)
        self._h = self._lib.bvh_build(self._v, len(self._v), self._t,
                                      len(self._t))

    def cast(self, rays_o: np.ndarray, rays_d: np.ndarray):
        rays_o = np.ascontiguousarray(rays_o, np.float64)
        rays_d = np.ascontiguousarray(rays_d, np.float64)
        n = len(rays_o)
        t_hit = np.empty(n, np.float64)
        prim = np.empty(n, np.int64)
        self._lib.bvh_cast(self._h, rays_o, rays_d, n, t_hit, prim)
        return t_hit, prim

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.bvh_free(self._h)
        except Exception:
            pass


def arap(vertices: np.ndarray, triangles: np.ndarray,
         constraint_ids: np.ndarray, constraint_pos: np.ndarray,
         max_iter: int = 20) -> np.ndarray:
    """As-rigid-as-possible deformation (Open3D
    deform_as_rigid_as_possible analog; reference
    editing/render_texture_swapping.py:56-59)."""
    lib = _load()
    assert lib is not None
    v = np.ascontiguousarray(vertices, np.float64)
    t = np.ascontiguousarray(triangles, np.int64)
    cid = np.ascontiguousarray(constraint_ids, np.int64)
    cpos = np.ascontiguousarray(constraint_pos, np.float64)
    out = np.empty_like(v)
    rc = lib.arap_deform(v, len(v), t, len(t), cid, cpos, len(cid),
                         int(max_iter), out)
    if rc != 0:
        raise RuntimeError(f"arap_deform failed rc={rc}")
    return out

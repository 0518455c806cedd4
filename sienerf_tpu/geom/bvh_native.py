"""ctypes loader for the native C++ BVH builder (csrc/bvh_builder.cpp).

Compiled on first use with g++ -O3 into csrc/build/; falls back silently
(geom.bvh catches exceptions and uses the numpy builder).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_CSRC = Path(__file__).resolve().parents[2] / "csrc"
_SO = _CSRC / "build" / "bvh_builder.so"
_lib = None


def _ensure_lib():
    global _lib
    if _lib is not None:
        return _lib
    src = _CSRC / "bvh_builder.cpp"
    if not src.exists():
        raise FileNotFoundError(src)
    if not _SO.exists() or _SO.stat().st_mtime < src.stat().st_mtime:
        _SO.parent.mkdir(parents=True, exist_ok=True)
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", str(src), "-o", str(_SO)],
            check=True,
            capture_output=True,
        )
    lib = ctypes.CDLL(str(_SO))
    lib.bvh_build.restype = ctypes.c_int
    lib.bvh_build.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
    ]
    _lib = lib
    return lib


def build(triangles: np.ndarray, leaf_size: int = 4):
    """Returns the TriangleBVH field tuple (bbox_min, bbox_max, first_tri,
    tri_count, skip, triangles_reordered, tri_index) or raises."""
    lib = _ensure_lib()
    tri = np.ascontiguousarray(triangles, np.float32)
    n = len(tri)
    max_nodes = 4 * (n // leaf_size + 2) + 16
    bbox_min = np.empty((max_nodes, 3), np.float32)
    bbox_max = np.empty((max_nodes, 3), np.float32)
    first_tri = np.empty(max_nodes, np.int32)
    tri_count = np.empty(max_nodes, np.int32)
    skip = np.empty(max_nodes, np.int32)
    perm = np.empty(n, np.int32)
    n_nodes = ctypes.c_int64(0)

    def p(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    rc = lib.bvh_build(
        p(tri, ctypes.c_float), n, leaf_size,
        p(bbox_min, ctypes.c_float), p(bbox_max, ctypes.c_float),
        p(first_tri, ctypes.c_int32), p(tri_count, ctypes.c_int32),
        p(skip, ctypes.c_int32), p(perm, ctypes.c_int32),
        max_nodes, ctypes.byref(n_nodes),
    )
    if rc != 0:
        raise RuntimeError(f"bvh_build failed rc={rc}")
    m = n_nodes.value
    return (
        bbox_min[:m].copy(),
        bbox_max[:m].copy(),
        first_tri[:m].copy(),
        tri_count[:m].copy(),
        skip[:m].copy(),
        tri[perm],
        perm.copy(),
    )


_SDF_SO = _CSRC / "build" / "sdf_query.so"
_sdf_lib = None


def _ensure_sdf_lib():
    global _sdf_lib
    if _sdf_lib is not None:
        return _sdf_lib
    src = _CSRC / "sdf_query.cpp"
    if not src.exists():
        raise FileNotFoundError(src)
    if not _SDF_SO.exists() or _SDF_SO.stat().st_mtime < src.stat().st_mtime:
        _SDF_SO.parent.mkdir(parents=True, exist_ok=True)
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
             str(src), "-o", str(_SDF_SO)],
            check=True,
            capture_output=True,
        )
    lib = ctypes.CDLL(str(_SDF_SO))
    lib.sdf_query.restype = ctypes.c_int
    lib.sdf_query.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    _sdf_lib = lib
    return lib


def sdf_query(bvh, points: np.ndarray, mode: int = 0, n_threads: int = 0) -> np.ndarray:
    """Host signed-distance queries against a TriangleBVH (native C++,
    multithreaded).  mode 0 = watertight parity, 1 = raystab-32.

    Geometry pointer-chasing runs on host threads, not TPU: the on-device
    DFS needs thousands of latency-bound while_loop rounds per batch and a
    scanned training bundle exceeds the TPU worker watchdog (see
    csrc/sdf_query.cpp)."""
    import os

    lib = _ensure_sdf_lib()
    pts = np.ascontiguousarray(points, np.float32)
    n = len(pts)
    out = np.empty(n, np.float32)
    tris = np.ascontiguousarray(bvh.triangles, np.float32)
    bmin = np.ascontiguousarray(bvh.bbox_min, np.float32)
    bmax = np.ascontiguousarray(bvh.bbox_max, np.float32)
    first = np.ascontiguousarray(bvh.first_tri, np.int32)
    count = np.ascontiguousarray(bvh.tri_count, np.int32)
    skip = np.ascontiguousarray(bvh.skip, np.int32)
    if n_threads <= 0:
        n_threads = max(1, (os.cpu_count() or 4) - 1)
    fp = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    ip = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    rc = lib.sdf_query(
        fp(tris), ctypes.c_int64(len(tris)),
        fp(bmin), fp(bmax), ip(first), ip(count), ip(skip),
        ctypes.c_int64(len(first)),
        fp(pts), ctypes.c_int64(n),
        ctypes.c_int(mode), ctypes.c_int(n_threads),
        fp(out),
    )
    if rc != 0:
        raise RuntimeError(f"sdf_query failed rc={rc}")
    return out

"""ctypes bindings for the native host-side runtime (native/slam_native.cpp):
kd-tree NN queries and greedy chessboard growth — the framework components
that genuinely belong in C++ (pointer-chasing, branchy, host-side; the
reference uses PCL kd-tree, st10 detector.cpp:458-467, and sequential C++
growth, detector.cpp:602-824).

The library auto-builds on first use (`make -C native`); a pure-Python
fallback keeps everything working when no toolchain is available.
"""

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libslam_native.so")
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _build_failed = True
        return None
    lib.kdtree_build.restype = ctypes.c_void_p
    lib.kdtree_build.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                                 ctypes.c_int]
    lib.kdtree_free.argtypes = [ctypes.c_void_p]
    lib.kdtree_knn.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
                               ctypes.c_int, ctypes.c_int,
                               ctypes.POINTER(ctypes.c_int),
                               ctypes.POINTER(ctypes.c_float)]
    lib.grow_chessboards.restype = ctypes.c_int
    lib.grow_chessboards.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    _lib = lib
    return _lib


def available():
    return _load() is not None


class KDTree:
    """Native kd-tree (2D/3D). Falls back to scipy.spatial.cKDTree."""

    def __init__(self, pts):
        pts = np.ascontiguousarray(np.asarray(pts, np.float32))
        self._n, self._dim = pts.shape
        lib = _load()
        if lib is None:
            from scipy.spatial import cKDTree
            self._fallback = cKDTree(pts)
            self._h = None
        else:
            self._fallback = None
            self._pts = pts  # keep alive
            self._lib = lib
            self._h = lib.kdtree_build(
                pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                self._n, self._dim)

    def query(self, q, k=1):
        """q (m,dim) -> (indices (m,k), sq_distances (m,k))."""
        q = np.ascontiguousarray(np.asarray(q, np.float32))
        m = q.shape[0]
        if self._h is None:
            d, i = self._fallback.query(q, k=k)
            d = np.atleast_2d(d.astype(np.float32) ** 2).reshape(m, k)
            i = np.atleast_2d(i.astype(np.int32)).reshape(m, k)
            return i, d
        idx = np.empty((m, k), np.int32)
        d2 = np.empty((m, k), np.float32)
        self._lib.kdtree_knn(self._h,
                             q.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                             m, k,
                             idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                             d2.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return idx, d2

    def __del__(self):
        if getattr(self, "_h", None) is not None:
            try:
                self._lib.kdtree_free(self._h)
            except Exception:
                pass


def grow_chessboards_native(xy, scores, dist_factor=1.6, cos_thresh=0.85,
                            max_boards=4, max_cells=32):
    """Native greedy chessboard growth; returns list of (rows, cols) index
    grids. Falls back to the Python implementation in frontend.chessboard."""
    lib = _load()
    xy = np.ascontiguousarray(np.asarray(xy, np.float32))
    scores = np.ascontiguousarray(np.asarray(scores, np.float32))
    if lib is None:
        from slam_tricks_tpu.frontend.chessboard import grow_chessboards
        return grow_chessboards(xy, None, scores, max_boards=max_boards,
                                dist_factor=dist_factor)
    n = xy.shape[0]
    out_grid = np.empty(max_boards * max_cells * max_cells, np.int32)
    out_shape = np.empty(2 * max_boards, np.int32)
    nb = lib.grow_chessboards(
        xy.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, dist_factor, cos_thresh, max_boards, max_cells,
        out_grid.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        out_shape.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    boards = []
    off = 0
    for b in range(nb):
        r, c = int(out_shape[2 * b]), int(out_shape[2 * b + 1])
        boards.append(out_grid[off:off + r * c].reshape(r, c).copy())
        off += r * c
    return boards

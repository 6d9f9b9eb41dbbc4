"""ctypes bindings for the native host-runtime library (native/*.cpp).

Drop-in accelerators for the numpy fallbacks in ops/hypotheses.py and
ops/pointcloud.py.  `available()` gates every use; callers silently fall back
when the library has not been built (native/build.sh).
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "native", "libsixdof_native.so")
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.cluster_poses.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_float, ctypes.c_float, ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.dbscan.restype = ctypes.c_int64
    lib.dbscan.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_double,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
    ]
    lib.has_neighbor_within.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.c_double, ctypes.POINTER(ctypes.c_uint8),
    ]
    _LIB = lib
    return _LIB


def available():
    return _load() is not None


def cluster_poses(angle_diff_deg, dist_diff, poses, symmetry_tfs):
    """Native greedy pose clustering; same contract as
    ops.hypotheses.cluster_poses."""
    lib = _load()
    poses_f = np.ascontiguousarray(poses, dtype=np.float32)
    sym_f = np.ascontiguousarray(symmetry_tfs, dtype=np.float32)
    keep = np.zeros(len(poses_f), dtype=np.uint8)
    lib.cluster_poses(
        poses_f.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(poses_f),
        sym_f.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(sym_f),
        ctypes.c_float(angle_diff_deg), ctypes.c_float(dist_diff),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return np.asarray(poses)[keep.astype(bool)]


def dbscan_labels(points, eps, min_points):
    """Native DBSCAN; same contract as ops.pointcloud.dbscan_labels."""
    lib = _load()
    pts = np.ascontiguousarray(points, dtype=np.float64)
    labels = np.empty(len(pts), dtype=np.int64)
    lib.dbscan(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(pts),
        ctypes.c_double(eps), ctypes.c_int64(min_points),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return labels


def has_neighbor_within(points, ref_points, radius):
    """(N,) bool: any ref point within radius of each query point."""
    lib = _load()
    pts = np.ascontiguousarray(points, dtype=np.float64)
    ref = np.ascontiguousarray(ref_points, dtype=np.float64)
    out = np.zeros(len(pts), dtype=np.uint8)
    lib.has_neighbor_within(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(pts),
        ref.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(ref),
        ctypes.c_double(radius), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out.astype(bool)

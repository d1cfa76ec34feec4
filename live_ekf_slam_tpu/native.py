"""ctypes bindings to the native C++ host runtime (native/src/*.cpp).

The compute path of this framework is JAX/Pallas on TPU; the host runtime
around it — occupancy-grid raster preprocessing and interactive-path planning
— is native C++ (the counterpart of the reference's C++ localization_pkg
runtime). Loads `live_ekf_slam_tpu/native_lib/liblesnative.so` if built
(`make -C native` or `cmake`), otherwise `available()` is False and callers
fall back to the numpy implementations.
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
    path = os.path.join(
        os.path.dirname(__file__), "native_lib", "liblesnative.so"
    )
    if os.path.exists(path):
        try:
            lib = ctypes.CDLL(path)
            lib.occgrid_from_rgb.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.astar_plan.restype = ctypes.c_int
            lib.astar_plan.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ]
            lib.local_planner_bfs.restype = ctypes.c_int
            lib.local_planner_bfs.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
            ]
            _LIB = lib
        except OSError:
            _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def occgrid_from_rgb(rgb: np.ndarray, size: int, balloon: int) -> np.ndarray:
    """RGB uint8 (h, w, 3) -> (size, size) float32 occupancy {0, 1}."""
    lib = _load()
    assert lib is not None
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    out = np.zeros((size, size), np.float32)
    lib.occgrid_from_rgb(
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        rgb.shape[0], rgb.shape[1], size, balloon,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def astar_plan(occ: np.ndarray, start_ij, goal_ij, diagonals=True):
    """Reference-semantics A*; returns list of (i, j) start->goal excl. start,
    or None."""
    lib = _load()
    assert lib is not None
    occ = np.ascontiguousarray(occ, dtype=np.float32)
    size = occ.shape[0]
    out = np.zeros((size * size, 2), np.int32)
    n = lib.astar_plan(
        occ.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), size,
        int(start_ij[0]), int(start_ij[1]), int(goal_ij[0]), int(goal_ij[1]),
        1 if diagonals else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), size * size,
    )
    if n < 0:
        return None
    return [tuple(row) for row in out[:n]]


def local_planner_bfs(occ: np.ndarray, start_ij):
    lib = _load()
    assert lib is not None
    occ = np.ascontiguousarray(occ, dtype=np.float32)
    out = np.zeros(2, np.int32)
    ok = lib.local_planner_bfs(
        occ.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), occ.shape[0],
        int(start_ij[0]), int(start_ij[1]),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return tuple(out) if ok else None

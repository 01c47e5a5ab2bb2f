"""ctypes bindings for the native C++ ballistic engine (`native/ballistics.cpp`).

Builds the shared library on demand with g++ (no pybind11 in the image; plain
C ABI + ctypes per the build constraints). The engine is the framework's
native replacement for the reference's SciPy-LSODA Fortran dependency
(reference `src/bcnf/simulation/physics.py:147`): adaptive RK45 velocity
integration with the reference's exact position/impact semantics, threaded
across trajectories.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libballistics.so"))

PARAM_LAYOUT = [
    "x0_x", "x0_y", "x0_z", "v0_x", "v0_y", "v0_z",
    "g_x", "g_y", "g_z", "w_x", "w_y", "w_z",
    "b", "m", "rho", "r", "a_x", "a_y", "a_z",
]


def build_library(force: bool = False) -> str:
    """Compile libballistics.so if missing (g++, host-only)."""
    if force or not os.path.exists(_LIB_PATH):
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR)],
            check=True,
            capture_output=True,
        )
    return _LIB_PATH


@lru_cache(maxsize=1)
def _lib() -> ctypes.CDLL:
    lib = ctypes.CDLL(build_library())
    dp = ctypes.POINTER(ctypes.c_double)
    lib.simulate_trajectories.argtypes = [
        dp, ctypes.c_int, ctypes.c_double, ctypes.c_double, ctypes.c_int,
        ctypes.c_int, ctypes.c_double, ctypes.c_double, ctypes.c_int, dp,
    ]
    lib.simulate_trajectories.restype = None
    lib.points_of_impact.argtypes = [dp, ctypes.c_int, ctypes.c_double, ctypes.c_int, dp]
    lib.points_of_impact.restype = None
    return lib


def params_matrix(params: dict[str, np.ndarray]) -> np.ndarray:
    """Pack a parameter dict into the engine's `(n, 19)` row layout."""
    cols = [np.asarray(params[k], dtype=np.float64) for k in PARAM_LAYOUT]
    return np.ascontiguousarray(np.stack(cols, axis=-1))


def simulate_trajectories(
    params: np.ndarray | dict,
    T: float,
    dt: float,
    break_on_impact: bool = True,
    rtol: float = 1e-8,
    atol: float = 1e-10,
    n_threads: int | None = None,
) -> np.ndarray:
    """Simulate `(n, n_steps, 3)` trajectories with the native engine."""
    if isinstance(params, dict):
        params = params_matrix(params)
    params = np.ascontiguousarray(params, dtype=np.float64)
    n = len(params)
    n_steps = int(np.ceil((T - 1e-12) / dt))
    out = np.empty((n, n_steps, 3), dtype=np.float64)
    if n_threads is None:
        n_threads = os.cpu_count() or 1
    dp = ctypes.POINTER(ctypes.c_double)
    _lib().simulate_trajectories(
        params.ctypes.data_as(dp), n, T, dt, int(break_on_impact),
        n_steps, rtol, atol, n_threads, out.ctypes.data_as(dp),
    )
    return out


def points_of_impact(
    params: np.ndarray | dict,
    dt: float = 0.1,
    n_threads: int | None = None,
) -> np.ndarray:
    """Ground-impact points `(n, 3)`; `[999]*3` sentinel for runaways."""
    if isinstance(params, dict):
        params = params_matrix(params)
    params = np.ascontiguousarray(params, dtype=np.float64)
    n = len(params)
    out = np.empty((n, 3), dtype=np.float64)
    if n_threads is None:
        n_threads = os.cpu_count() or 1
    dp = ctypes.POINTER(ctypes.c_double)
    _lib().points_of_impact(params.ctypes.data_as(dp), n, dt, n_threads, out.ctypes.data_as(dp))
    return out

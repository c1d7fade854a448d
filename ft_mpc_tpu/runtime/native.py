"""ctypes binding + build-on-first-use for the C++ runtime library."""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_SRC = _HERE / "zonotope_native.cpp"
_LIB = _HERE / "libftmpc_runtime.so"

_lib = None
_load_error: str | None = None


def _build() -> None:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        str(_SRC), "-o", str(_LIB),
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib, _load_error
    if _lib is not None or _load_error is not None:
        return _lib
    try:
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            _build()
        lib = ctypes.CDLL(str(_LIB))
        lib.ftmpc_batched_wrench_hulls.restype = ctypes.c_int
        lib.ftmpc_batched_wrench_hulls.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_double,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ]
        _lib = lib
    except Exception as e:  # no compiler / load failure -> numpy fallback
        _load_error = str(e)
    return _lib


def native_available() -> bool:
    return _load() is not None


def _as_c(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def batched_wrench_hulls(
    D: np.ndarray,
    max_thrust: float,
    broken: np.ndarray,  # (B, n_thrusters)
    intensity: np.ndarray,  # (B, n_thrusters)
    max_facets: int = 32,
    n_threads: int | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Padded (A, b, mask) hulls for a fault bank.

    Uses the threaded C++ engine when available, else the numpy
    implementation (`geometry.zonotope.attainable_wrench_polytope`).
    """
    D = np.ascontiguousarray(D, dtype=np.float64)
    broken = np.ascontiguousarray(np.atleast_2d(broken), dtype=np.float64)
    intensity = np.ascontiguousarray(np.atleast_2d(intensity), dtype=np.float64)
    B, n_thr = broken.shape
    assert D.shape == (6, n_thr)

    lib = _load()
    if lib is not None:
        A = np.zeros((B, max_facets, 6), dtype=np.float64)
        b = np.ones((B, max_facets), dtype=np.float64)
        mask = np.zeros((B, max_facets), dtype=np.float64)
        rc = lib.ftmpc_batched_wrench_hulls(
            _as_c(D), n_thr, ctypes.c_double(max_thrust),
            _as_c(broken), _as_c(intensity), B, max_facets,
            _as_c(A), _as_c(b), _as_c(mask),
            n_threads or (os.cpu_count() or 1),
        )
        if rc != 0:
            raise ValueError(
                f"a fault pattern produced more than {max_facets} facets; "
                "pass a larger max_facets"
            )
        # The C++ engine handles the full-rank 6-d case; degenerate wrench
        # sets (e.g. planar craft: generators span a subspace) come back
        # with zero facets -- recompute those with the general numpy path.
        empty = np.where(mask.sum(axis=1) == 0)[0]
        if empty.size:
            from ft_mpc_tpu.geometry.zonotope import attainable_wrench_polytope

            for s in empty:
                poly = attainable_wrench_polytope(
                    D, max_thrust, broken[s], intensity[s]
                )
                A[s], b[s], mask[s] = poly.as_padded(max_facets)
        return A, b, mask

    # numpy fallback
    from ft_mpc_tpu.geometry.zonotope import attainable_wrench_polytope

    A = np.zeros((B, max_facets, 6), dtype=np.float64)
    b = np.ones((B, max_facets), dtype=np.float64)
    mask = np.zeros((B, max_facets), dtype=np.float64)
    for s in range(B):
        poly = attainable_wrench_polytope(D, max_thrust, broken[s], intensity[s])
        A[s], b[s], mask[s] = poly.as_padded(max_facets)
    return A, b, mask

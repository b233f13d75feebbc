"""Native host-side loader kernels (C, ctypes-loaded).

Compiled on demand with `cc -O3 -shared -fPIC` (pybind11 is not available
in this environment — see loader.c). Falls back cleanly: callers use
`native_available()` / the numpy paths when no C compiler exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_LIB = None
_TRIED = False


def _build() -> str | None:
    src = os.path.join(os.path.dirname(__file__), "loader.c")
    out = os.path.join(
        tempfile.gettempdir(), f"vlp3d_loader_{os.getuid()}.so"
    )
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    for cc in ("cc", "gcc", "clang"):
        try:
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-o", out, src],
                check=True,
                capture_output=True,
            )
            return out
        except (OSError, subprocess.CalledProcessError):
            continue
    return None


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _build()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.compute_votes.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
    ]
    lib.gather_rows_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
    ]
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return _load() is not None


def compute_votes(
    points: np.ndarray,  # (N, >=3) f32, xyz first
    instance_labels: np.ndarray,  # (N,) int
    semantic_ok: np.ndarray,  # (N,) bool — label in the detection set
):
    """Single-pass GT vote regeneration. Returns (votes (N,3) f32,
    mask (N,) f32)."""
    lib = _load()
    n = points.shape[0]
    points = np.ascontiguousarray(points, np.float32)
    instance_labels = np.ascontiguousarray(instance_labels, np.int64)
    sem_ok = np.ascontiguousarray(semantic_ok, np.uint8)
    votes = np.zeros((n, 3), np.float32)
    mask = np.zeros((n,), np.float32)
    lib.compute_votes(
        points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        points.shape[1],
        n,
        instance_labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        sem_ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        votes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return votes, mask

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
    # content-hashed cache name: stale-proof across checkouts/versions
    # (an mtime check let an older checkout clobber a newer build)
    import hashlib

    with open(src, "rb") as f:
        digest = hashlib.sha1(f.read()).hexdigest()[:12]
    out = os.path.join(
        tempfile.gettempdir(), f"vlp3d_loader_{os.getuid()}_{digest}.so"
    )
    if os.path.exists(out):
        return out
    for cc in ("cc", "gcc", "clang"):
        try:
            # -ffp-contract=off: gather_augment_rows must round exactly
            # like the numpy augment chain (no a*b+c FMA fusion)
            subprocess.run(
                [cc, "-O3", "-ffp-contract=off", "-shared", "-fPIC",
                 "-pthread", "-o", out, src],
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
    lib.gather_rows_i64.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
    ]
    lib.gather_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.gather_augment_rows.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_float, ctypes.POINTER(ctypes.c_double),
        ctypes.c_int, ctypes.c_float,
    ]
    lib.compute_votes_tiled.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.vlp3d_buf_acquire.argtypes = [ctypes.c_size_t]
    lib.vlp3d_buf_acquire.restype = ctypes.c_void_p
    lib.vlp3d_buf_release.argtypes = [ctypes.c_void_p, ctypes.c_size_t]
    lib.vlp3d_buf_release.restype = None
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


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _u8p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def gather_augment_rows(
    scene_pc: np.ndarray,  # (N_raw, C_raw) f32 C-contiguous
    choices: np.ndarray,  # (n,) int64
    out: np.ndarray,  # (n, C_out >= C_raw) f32 — a batch-buffer slot view
    *,
    params=None,  # augment.AugmentParams or None (no augmentation)
    use_height: bool = False,
    floor_height: float = 0.0,
) -> None:
    """Fused sample-gather + augment + height channel, one C pass.

    Bit-identical to: a plain row gather, then the numpy augment chain
    (vlp3d.data.augment.apply_augment_points) on the xyz/col-3 columns,
    then the height write — see loader.c:gather_augment_rows for the
    exact per-step rounding contract."""
    lib = _load()
    assert scene_pc.dtype == np.float32 and scene_pc.flags.c_contiguous
    assert out.dtype == np.float32 and out.strides[1] == 4
    choices = np.ascontiguousarray(choices, np.int64)
    if params is not None:
        rot = np.ascontiguousarray(params.rot, np.float64)
        scale = np.ascontiguousarray(params.scale, np.float64)
        trans = np.ascontiguousarray(params.trans, np.float64)
        s22 = np.float32(float(params.scale[2, 2]))
        flip0, flip1 = int(params.flip0), int(params.flip1)
        aug = 1
    else:
        rot = scale = np.zeros((3, 3), np.float64)
        trans = np.zeros((3,), np.float64)
        s22 = np.float32(0)
        flip0 = flip1 = aug = 0
    lib.gather_augment_rows(
        _f32p(scene_pc), scene_pc.shape[1], _i64p(choices),
        choices.shape[0], scene_pc.shape[1], _f32p(out),
        out.strides[0] // 4, out.shape[1], aug, flip0, flip1,
        _f64p(rot), _f64p(scale), s22, _f64p(trans),
        int(use_height), np.float32(floor_height),
    )


def gather_i64(src: np.ndarray, choices: np.ndarray, out: np.ndarray) -> None:
    lib = _load()
    src = np.ascontiguousarray(src, np.int64)
    choices = np.ascontiguousarray(choices, np.int64)
    assert out.dtype == np.int64 and out.flags.c_contiguous
    lib.gather_rows_i64(_i64p(src), _i64p(choices), choices.shape[0],
                        _i64p(out))


def gather_u8(src: np.ndarray, choices: np.ndarray) -> np.ndarray:
    lib = _load()
    src = np.ascontiguousarray(src, np.uint8)
    choices = np.ascontiguousarray(choices, np.int64)
    out = np.empty(choices.shape[0], np.uint8)
    lib.gather_u8(_u8p(src), _i64p(choices), choices.shape[0], _u8p(out))
    return out


class _NativeBuffer:
    """A recycled mmap buffer from the C free list. numpy arrays built on
    it keep it alive through their base chain; when the LAST view dies the
    buffer returns to the pool — correct even if a zero-copy consumer
    (e.g. jax CPU device_put) holds a reference past the loader's loop."""

    def __init__(self, size: int):
        lib = _load()
        self._size = size
        self._addr = lib.vlp3d_buf_acquire(size)
        if not self._addr:
            raise MemoryError(f"vlp3d_buf_acquire({size}) failed")

    @property
    def __array_interface__(self):
        return {
            "version": 3,
            "typestr": "|u1",
            "shape": (self._size,),
            "data": (self._addr, False),
        }

    def __del__(self):
        lib = _LIB
        addr = getattr(self, "_addr", None)
        if lib is not None and addr:
            try:
                lib.vlp3d_buf_release(ctypes.c_void_p(addr), self._size)
            except Exception:
                pass  # interpreter shutdown


def alloc_array(shape, dtype) -> np.ndarray:
    """np.empty equivalent backed by the recycled native buffer pool —
    use for the large per-batch arrays whose fresh-allocation page-fault
    storms dominate loader time (see loader.c)."""
    dtype = np.dtype(dtype)
    size = int(np.prod(shape, dtype=np.int64)) * dtype.itemsize
    buf = _NativeBuffer(max(size, 1))
    a = np.asarray(buf)
    return a[:size].view(dtype).reshape(shape)


def compute_votes_tiled(
    points: np.ndarray,  # (n, C) f32, xyz first; row stride = C (a slot view)
    instance_labels: np.ndarray,  # (n,) int64
    semantic_ok: np.ndarray,  # (n,) uint8
    votes_out: np.ndarray,  # (n, 9) f32 — batch-buffer slot
    mask_out: np.ndarray,  # (n,) int64 — batch-buffer slot
) -> None:
    """compute_votes + the x3 vote tiling + int64 mask, written in place
    (dataset.py:669-679 semantics; see loader.c)."""
    lib = _load()
    assert points.dtype == np.float32 and points.strides[1] == 4
    assert votes_out.dtype == np.float32 and votes_out.strides[1] == 4
    assert mask_out.dtype == np.int64 and mask_out.flags.c_contiguous
    instance_labels = np.ascontiguousarray(instance_labels, np.int64)
    semantic_ok = np.ascontiguousarray(semantic_ok, np.uint8)
    lib.compute_votes_tiled(
        _f32p(points), points.strides[0] // 4, points.shape[0],
        _i64p(instance_labels), _u8p(semantic_ok), _f32p(votes_out),
        votes_out.strides[0] // 4, _i64p(mask_out),
    )

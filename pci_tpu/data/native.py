"""ctypes bridge to the native host-side kernels (native/pci_native.cpp).

Builds the shared library on first use if the toolchain is available;
falls back to pure numpy otherwise (same semantics, slower).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LIB = None
_LOCK = threading.Lock()
_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)


def _load():
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        so = os.path.join(_NATIVE_DIR, "libpci_native.so")
        if not os.path.exists(so):
            src = os.path.join(_NATIVE_DIR, "pci_native.cpp")
            if not os.path.exists(src):
                _LIB = False
                return _LIB
            try:
                subprocess.run(
                    ["g++", "-O3", "-fopenmp", "-shared", "-fPIC", "-std=c++17", "-o", so, src],
                    check=True, capture_output=True,
                )
            except (subprocess.CalledProcessError, FileNotFoundError):
                _LIB = False
                return _LIB
        lib = ctypes.CDLL(so)
        lib.pci_fps_indices.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
        ]
        lib.pci_voxel_downsample.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_float, ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ]
        lib.pci_voxel_downsample.restype = ctypes.c_int64
        lib.pci_load_scan.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_uint64, ctypes.POINTER(ctypes.c_float),
        ]
        lib.pci_load_scan.restype = ctypes.c_int64
        _LIB = lib
        return _LIB


def have_native() -> bool:
    return bool(_load())


def fps_indices(points: np.ndarray, npoint: int, start: int = 0) -> np.ndarray:
    """Greedy FPS over ``[N, >=3]`` float32 points -> ``[npoint]`` int32."""
    pts = np.ascontiguousarray(points, dtype=np.float32)
    n, stride = pts.shape
    lib = _load()
    if lib:
        out = np.empty(npoint, dtype=np.int32)
        lib.pci_fps_indices(
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n, stride, npoint, start,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return out
    # numpy fallback (identical greedy semantics)
    dist = np.full(n, np.inf, dtype=np.float32)
    out = np.empty(npoint, dtype=np.int32)
    farthest = start % n
    xyz = pts[:, :3]
    for i in range(npoint):
        out[i] = farthest
        d = np.sum((xyz - xyz[farthest]) ** 2, axis=-1)
        np.minimum(dist, d, out=dist)
        farthest = int(np.argmax(dist))
    return out


def load_scan(
    path: str, width: int, npoints: int, seed: int
) -> np.ndarray | None:
    """Read a float32 ``.bin`` scan and random-subsample to ``npoints``
    rows without replacement (wrap-pad when short) in ONE native call:
    mmap read, partial Fisher-Yates, OpenMP row copy — no full-scan
    numpy materialization or fancy-index round trip.  Deterministic per
    ``seed``.  Returns ``[npoints, width]`` float32, or ``None`` when the
    native library or the file is unavailable (callers fall back to
    ``np.fromfile`` + :func:`pci_tpu.data.lidar.random_subsample`)."""
    lib = _load()
    if not lib:
        return None
    out = np.empty((npoints, width), dtype=np.float32)
    n = lib.pci_load_scan(
        os.fsencode(path), width, npoints, ctypes.c_uint64(seed & (2**64 - 1)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if n < 0:
        return None
    return out


def voxel_downsample_indices(points: np.ndarray, voxel: float) -> np.ndarray:
    """First-point-per-voxel downsample -> kept row indices (int32)."""
    pts = np.ascontiguousarray(points, dtype=np.float32)
    n, stride = pts.shape
    lib = _load()
    if lib:
        out = np.empty(n, dtype=np.int32)
        kept = lib.pci_voxel_downsample(
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n, stride, voxel,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n,
        )
        return out[:kept]
    keys = np.floor(pts[:, :3] / voxel).astype(np.int64)
    _, first = np.unique(keys, axis=0, return_index=True)
    return np.sort(first).astype(np.int32)

"""LiDAR scan readers and host-side samplers.

Data formats (verified against the reference's shipped demo data,
SURVEY.md section 2.5): KITTI ``.bin`` = float32 x4 (x, y, z, intensity);
nuScenes ``.bin`` = float32 x5.  Layout here is channels-last ``[N, C]``.
"""

from __future__ import annotations

import os

import numpy as np

from . import native

# Opt-in native IO: the fused mmap-load + Fisher-Yates subsample skips the
# full-scan numpy materialization + fancy-index round trip of the python
# path.  Default OFF so seeded sampling streams (goldens, accuracy gates)
# stay bit-stable; enable with PCI_TPU_NATIVE_IO=1.
def _native_io() -> bool:
    return os.environ.get("PCI_TPU_NATIVE_IO", "0") == "1"


def read_kitti_bin(path: str) -> np.ndarray:
    """KITTI velodyne scan -> ``[N, 4]`` float32 (xyz + intensity)."""
    return np.fromfile(path, dtype=np.float32).reshape(-1, 4)


def read_nuscenes_bin(path: str) -> np.ndarray:
    """nuScenes LIDAR_TOP scan -> ``[N, 5]`` float32."""
    return np.fromfile(path, dtype=np.float32).reshape(-1, 5)


def read_result_bin(path: str, channels: int = 3) -> np.ndarray:
    """Saved interpolation result (float32 x3, or x4 with intensity)."""
    return np.fromfile(path, dtype=np.float32).reshape(-1, channels)


def read_subsample(
    path: str,
    width: int,
    npoints: int,
    rng: np.random.Generator,
    channels: int | None = None,
) -> np.ndarray:
    """Load a float32 scan and random-subsample to ``npoints`` rows (the
    dataset ``__getitem__`` hot pattern, reference
    Dataset/InterpolationData.py:60-77) — one native call when
    ``PCI_TPU_NATIVE_IO=1`` (C++ mmap + partial Fisher-Yates + OpenMP
    copy, native/pci_native.cpp), numpy otherwise.  ``channels`` keeps
    the leading columns after load.  Deterministic given ``rng`` state on
    both paths (the native path consumes one draw as its seed)."""
    if _native_io():
        out = native.load_scan(path, width, npoints, int(rng.integers(2**63)))
        if out is not None:
            return out if channels is None else out[:, :channels]
    pts = np.fromfile(path, dtype=np.float32).reshape(-1, width)
    if channels is not None:
        pts = pts[:, :channels]
    return random_subsample(pts, npoints, rng)


def random_subsample(
    points: np.ndarray, npoints: int, rng: np.random.Generator
) -> np.ndarray:
    """Sample without replacement; pad with replacement if short
    (the reference's protocol, e.g. interpolation_data.py:66-77)."""
    n = points.shape[0]
    if n >= npoints:
        idx = rng.choice(n, npoints, replace=False)
    else:
        idx = np.concatenate(
            [np.arange(n), rng.choice(n, npoints - n, replace=True)]
        )
    return points[idx]


# Deterministic-FPS index cache.  Greedy FPS with a fixed start is a pure
# function of the scan bytes, and the training datasets re-sample the SAME
# frames every epoch — on a 1-vCPU host the native FPS (30k->16k, ~0.7 s)
# dominated the ISAPCInet train step (~9.5 s/step measured r5, chip idle).
# Keyed by a content digest so it is bit-identical to the uncached path.
# In-memory always (cap PCI_TPU_FPS_CACHE_MAX entries, 0 disables); set
# PCI_TPU_FPS_CACHE_DIR for cross-process persistence (.npy index files).
_fps_cache: dict = {}


def _fps_cache_max() -> int:
    return int(os.environ.get("PCI_TPU_FPS_CACHE_MAX", "8192"))


def _fps_cache_key(points: np.ndarray, npoints: int, start: int):
    import hashlib

    digest = hashlib.md5(points.tobytes()).hexdigest()
    return (digest, points.shape, str(points.dtype), npoints, start)


def _fps_disk_path(key) -> str | None:
    # default: pick up a prewarmed runs/.fps_cache when cwd is the repo
    # root (pure-function cache — contents are digest-keyed, so a stale
    # or foreign dir can only miss, never corrupt)
    d = os.environ.get("PCI_TPU_FPS_CACHE_DIR")
    if d is None and os.path.isdir("runs/.fps_cache"):
        d = "runs/.fps_cache"
    if not d:
        return None
    digest, shape, _, npoints, start = key
    return os.path.join(d, f"fps_{digest}_{shape[0]}x{shape[1]}_{npoints}_{start}.npy")


def fps_subsample(points: np.ndarray, npoints: int, start: int = 0) -> np.ndarray:
    """Farthest-point downsample via the native kernel (the reference used
    Open3D's C++ FPS, Dataset/InterpolationData.py:144-147).  Indices are
    cached by content digest (see above) — semantics unchanged."""
    cap = _fps_cache_max()
    if cap <= 0:
        return points[native.fps_indices(points, npoints, start)]
    key = _fps_cache_key(points, npoints, start)
    idx = _fps_cache.get(key)
    if idx is None:
        path = _fps_disk_path(key)
        if path is not None and os.path.exists(path):
            idx = np.load(path)
        else:
            idx = native.fps_indices(points, npoints, start)
            if path is not None:
                os.makedirs(os.path.dirname(path), exist_ok=True)
                # must end in .npy or np.save appends the suffix itself
                tmp = f"{path}.{os.getpid()}.tmp.npy"
                np.save(tmp, idx)
                os.replace(tmp, path)
        while len(_fps_cache) >= cap:
            _fps_cache.pop(next(iter(_fps_cache)))
        _fps_cache[key] = idx
    return points[idx]


def subsample(
    points: np.ndarray,
    npoints: int,
    method: str = "random",
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    if method == "random":
        assert rng is not None
        return random_subsample(points, npoints, rng)
    if method == "fps":
        if points.shape[0] < npoints:
            assert rng is not None
            return random_subsample(points, npoints, rng)
        return fps_subsample(points, npoints)
    raise ValueError(f"unknown subsample method {method!r}")

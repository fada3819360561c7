"""Interpolation and scene-flow dataset samplers (numpy, torch-free).

Window protocols mirrored from the reference (SURVEY.md section 2.5):
  * NuscenesInterpolationDataset — ISAPCI key-pair protocol
    (Dataset/InterpolationData.py:13-176)
  * PolyPCIDataset — key-centric protocol with relative times T
    (PolyPCI/Dataset/Dataset.py:13-201)
  * KittiInterpolationDataset / NuscenesTripletDataset — PointINet
    triplets (PointINet20230424/data/interpolation_data.py)
  * Flythings3D / KittiSceneFlowDataset / KittiOdometrySceneflow /
    NuScenesFlowPairs — FlowNet3D pretraining
    (PointINet20230424/data/sceneflow_data.py)

Every sampler yields channels-last numpy float32 with a fixed ``npoints``
(static shapes for the jitted step).  Samplers are plain indexable
objects; batching/prefetch lives in ``pipeline.py``.
"""

from __future__ import annotations

import glob
import os


import numpy as np

from .lidar import (
    random_subsample,
    read_kitti_bin,
    read_nuscenes_bin,
    read_subsample,
    subsample,
)


def read_scene_list(path: str) -> list[str]:
    with open(path) as f:
        return [line.strip() for line in f if line.strip()]


def load_scene_split(scenes: list[str], scene_split_lib: str):
    """Read per-scene '<frame_name> <timestamp>' listings."""
    timestamp_list, fns_list = [], []
    for scene in scenes:
        times, fns = [], []
        with open(os.path.join(scene_split_lib, scene + ".txt")) as f:
            for line in f:
                parts = line.strip("\n").split(" ")
                if len(parts) < 2:
                    continue
                fns.append(parts[0])
                times.append(float(parts[1]))
        timestamp_list.append(times)
        fns_list.append(fns)
    return timestamp_list, fns_list


class NuscenesInterpolationDataset:
    """ISAPCI protocol: interval-strided key pairs with `field` context
    frames each side; t normalized between the key timestamps."""

    def __init__(
        self,
        root: str,
        scenes_list: str,
        scene_split_lib: str,
        field: int = 1,
        npoints: int = 16000,
        interval: int = 5,
        if_random: bool = False,
        random_times: int = 1,
        sample_method: str = "fps",
        seed: int = 0,
    ):
        self.root = root
        self.field = field
        self.npoints = npoints
        self.interval = interval
        self.sample_method = sample_method
        self.rng = np.random.default_rng(seed)
        scenes = read_scene_list(scenes_list)
        self.timestamps, self.fns = load_scene_split(scenes, scene_split_lib)
        self.windows = self._make_windows(if_random, random_times)

    def _make_windows(self, if_random, random_times):
        windows = []
        f, itv = self.field, self.interval
        for times, fns in zip(self.timestamps, self.fns):
            max_ind = len(times)
            front = f * itv
            back = front + itv
            while back + f * itv < max_ind:
                biases = (
                    self.rng.integers(1, itv, random_times)
                    if if_random
                    else range(1, itv)
                )
                for bias in biases:
                    forw = [fns[front - itv * j] for j in range(1, f + 1)]
                    backw = [fns[back + itv * j] for j in range(1, f + 1)]
                    keys = [fns[front], fns[back]]
                    t = (times[front + bias] - times[front]) / (
                        times[back] - times[front]
                    )
                    windows.append((forw, keys, backw, float(t), fns[front + bias]))
                front = back
                back = back + itv
        return windows

    def _get_lidar(self, fn):
        pts = read_nuscenes_bin(os.path.join(self.root, fn))[:, :3]
        return subsample(pts, self.npoints, self.sample_method, self.rng).astype(
            np.float32
        )

    def __len__(self):
        return len(self.windows)

    def __getitem__(self, index):
        forw, keys, backw, t, gt_fn = self.windows[index]
        return {
            "forward": [self._get_lidar(fn) for fn in forw],
            "keys": [self._get_lidar(fn) for fn in keys],
            "backward": [self._get_lidar(fn) for fn in backw],
            "t": np.float32(t),
            "gt": self._get_lidar(gt_fn),
            "ini": np.zeros((self.npoints, 3), np.float32),
        }


class PolyPCIDataset:
    """Key-frame-centric protocol with relative frame times.

    T ordering matches the PolyPCI model's trajectory stack:
    ``[key(0), fwd_ring1, bwd_ring1, fwd_ring2, bwd_ring2, ...]``
    (PolyPCI/Dataset/Dataset.py:84-96 appends key then per-ring fwd, bwd).
    t ranges over [-field, field] key-interval units (negative =
    extrapolating before the key frame).
    """

    def __init__(
        self,
        root: str,
        scenes_list: str,
        scene_split_lib: str,
        field: int = 1,
        npoints: int = 16000,
        interval: int = 5,
        if_random: bool = False,
        random_times: int = 1,
        sample_method: str = "fps",
        seed: int = 0,
    ):
        self.root = root
        self.field = field
        self.npoints = npoints
        self.interval = interval
        self.sample_method = sample_method
        self.rng = np.random.default_rng(seed)
        scenes = read_scene_list(scenes_list)
        self.timestamps, self.fns = load_scene_split(scenes, scene_split_lib)
        self.windows = self._make_windows(if_random, random_times)

    def _make_windows(self, if_random, random_times):
        windows = []
        f, itv = self.field, self.interval
        for times, fns in zip(self.timestamps, self.fns):
            max_ind = len(times)
            key = f * itv
            while key + f * itv < max_ind:
                biases = (
                    self.rng.integers(-f * itv, f * itv + 1, random_times)
                    if if_random
                    else range(-f * itv, f * itv + 1)
                )
                for bias in biases:
                    forw, backw, T = [], [], [0.0]
                    for j in range(1, f + 1):
                        forw.append(fns[key - itv * j])
                        T.append(
                            (times[key - itv * j] - times[key])
                            / (times[key] - times[key - itv])
                        )
                        backw.append(fns[key + itv * j])
                        T.append(
                            (times[key + itv * j] - times[key])
                            / (times[key + itv] - times[key])
                        )
                    if bias < 0:
                        t = (times[key + bias] - times[key]) / (
                            times[key] - times[key - itv]
                        )
                    elif bias > 0:
                        t = (times[key + bias] - times[key]) / (
                            times[key + itv] - times[key]
                        )
                    else:
                        t = 0.0
                    windows.append(
                        (forw, fns[key], backw, float(t), T, fns[key + bias])
                    )
                key = key + itv
        return windows

    def _get_lidar(self, fn):
        pts = read_nuscenes_bin(os.path.join(self.root, fn))[:, :3]
        return subsample(pts, self.npoints, self.sample_method, self.rng).astype(
            np.float32
        )

    def __len__(self):
        return len(self.windows)

    def __getitem__(self, index):
        forw, key, backw, t, T, gt_fn = self.windows[index]
        return {
            "forward": [self._get_lidar(fn) for fn in forw],
            "key": self._get_lidar(key),
            "backward": [self._get_lidar(fn) for fn in backw],
            "t": np.float32(t),
            "T": np.asarray(T, np.float32),
            "gt": self._get_lidar(gt_fn),
            "ini": np.zeros((self.npoints, 3), np.float32),
        }


class KittiInterpolationDataset:
    """PointINet triplet protocol over a KITTI odometry sequence dir
    (velodyne/*.bin + times.txt)."""

    def __init__(
        self,
        root: str,
        npoints: int = 16384,
        interval: int = 5,
        train: bool = True,
        use_intensity: bool = True,
        seed: int = 0,
    ):
        self.npoints = npoints
        self.use_intensity = use_intensity
        self.rng = np.random.default_rng(seed)
        with open(os.path.join(root, "times.txt")) as f:
            self.times = [float(line.strip()) for line in f if line.strip()]
        self.paths = sorted(glob.glob(os.path.join(root, "velodyne", "*.bin")))
        self.triples = []
        ini = 0
        max_ind = len(self.paths)
        while ini < max_ind - interval:
            end = ini + interval
            if train:
                mid = int(self.rng.integers(1, interval)) + ini
                self.triples.append((ini, mid, end))
            else:
                for bias in range(1, interval):
                    self.triples.append((ini, ini + bias, end))
            ini = end

    def _cloud(self, idx):
        pc = read_subsample(self.paths[idx], 4, self.npoints, self.rng)
        return pc if self.use_intensity else pc[:, :3]

    def __len__(self):
        return len(self.triples)

    def __getitem__(self, index):
        i, m, e = self.triples[index]
        t = (self.times[m] - self.times[i]) / (self.times[e] - self.times[i])
        return {
            "ini_pc": self._cloud(i).astype(np.float32),
            "mid_pc": self._cloud(m).astype(np.float32),
            "end_pc": self._cloud(e).astype(np.float32),
            "color": np.zeros((self.npoints, 3), np.float32),
            "t": np.float32(t),
        }


class NuscenesTripletDataset:
    """PointINet triplet protocol from a nuScenes scene split."""

    def __init__(
        self,
        root: str,
        scenes_list: str,
        scene_split_lib: str,
        npoints: int = 16384,
        interval: int = 5,
        train: bool = True,
        use_intensity: bool = True,
        seed: int = 0,
    ):
        self.root = root
        self.npoints = npoints
        self.use_intensity = use_intensity
        self.rng = np.random.default_rng(seed)
        scenes = read_scene_list(scenes_list)
        self.timestamps, self.fns = load_scene_split(scenes, scene_split_lib)
        self.triples = []
        for times, fns in zip(self.timestamps, self.fns):
            ini = 0
            while ini < len(fns) - interval:
                end = ini + interval
                if train:
                    mid = int(self.rng.integers(1, interval)) + ini
                    self.triples.append(
                        ((fns[ini], fns[mid], fns[end]), (times[ini], times[mid], times[end]))
                    )
                else:
                    for bias in range(1, interval):
                        mid = ini + bias
                        self.triples.append(
                            ((fns[ini], fns[mid], fns[end]), (times[ini], times[mid], times[end]))
                        )
                ini = end

    def _cloud(self, fn):
        pc = read_subsample(
            os.path.join(self.root, fn), 5, self.npoints, self.rng,
            channels=4,
        )
        return pc if self.use_intensity else pc[:, :3]

    def __len__(self):
        return len(self.triples)

    def __getitem__(self, index):
        (f_i, f_m, f_e), (t_i, t_m, t_e) = self.triples[index]
        t = (t_m - t_i) / (t_e - t_i)
        return {
            "ini_pc": self._cloud(f_i).astype(np.float32),
            "mid_pc": self._cloud(f_m).astype(np.float32),
            "end_pc": self._cloud(f_e).astype(np.float32),
            "color": np.zeros((self.npoints, 3), np.float32),
            "t": np.float32(t),
        }


class Flythings3D:
    """Supervised scene-flow pairs from preprocessed FlyThings3D .npz files."""

    BAD = "TRAIN_C_0140_left_0006-0"  # nan sample excluded by the reference

    def __init__(self, root: str, npoints: int = 2048, train: bool = True, seed: int = 0):
        self.npoints = npoints
        self.train = train
        self.rng = np.random.default_rng(seed)
        pattern = "TRAIN*.npz" if train else "TEST*.npz"
        self.paths = [
            p for p in sorted(glob.glob(os.path.join(root, pattern)))
            if self.BAD not in p
        ]
        self._cache: dict[int, tuple] = {}
        self.cache_size = 30000

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, index):
        if index in self._cache:
            pos1, pos2, color1, color2, flow, mask1 = self._cache[index]
        else:
            with open(self.paths[index], "rb") as fp:
                data = np.load(fp)
                pos1 = data["points1"].astype(np.float32)
                pos2 = data["points2"].astype(np.float32)
                color1 = data["color1"].astype(np.float32) / 255
                color2 = data["color2"].astype(np.float32) / 255
                flow = data["flow"].astype(np.float32)
                mask1 = data["valid_mask1"]
            if len(self._cache) < self.cache_size:
                self._cache[index] = (pos1, pos2, color1, color2, flow, mask1)

        if self.train:
            i1 = self.rng.choice(pos1.shape[0], self.npoints, replace=False)
            i2 = self.rng.choice(pos2.shape[0], self.npoints, replace=False)
            pos1, color1, flow, mask1 = pos1[i1], color1[i1], flow[i1], mask1[i1]
            pos2, color2 = pos2[i2], color2[i2]
        else:
            pos1, color1, flow, mask1 = (
                pos1[: self.npoints], color1[: self.npoints],
                flow[: self.npoints], mask1[: self.npoints],
            )
            pos2, color2 = pos2[: self.npoints], color2[: self.npoints]

        center = pos1.mean(axis=0)
        pos1 = pos1 - center
        pos2 = pos2 - center
        return {
            "points1": pos1, "points2": pos2,
            "feats1": color1, "feats2": color2,
            "flow": flow, "mask": mask1.astype(np.float32),
        }


class KittiSceneFlowDataset:
    """KITTI scene-flow eval pairs from .npz (pos1/pos2/gt)."""

    def __init__(self, root: str, npoints: int = 2048, seed: int = 0):
        self.npoints = npoints
        self.rng = np.random.default_rng(seed)
        self.paths = sorted(glob.glob(os.path.join(root, "*.npz")))

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, index):
        with open(self.paths[index], "rb") as fp:
            data = np.load(fp)
            pos1 = data["pos1"].astype(np.float32)
            pos2 = data["pos2"].astype(np.float32)
            flow = data["gt"].astype(np.float32)
        n1, n2 = pos1.shape[0], pos2.shape[0]
        i1 = (
            self.rng.choice(n1, self.npoints, replace=False)
            if n1 >= self.npoints
            else np.concatenate([np.arange(n1), self.rng.choice(n1, self.npoints - n1)])
        )
        i2 = (
            self.rng.choice(n2, self.npoints, replace=False)
            if n2 >= self.npoints
            else np.concatenate([np.arange(n2), self.rng.choice(n2, self.npoints - n2)])
        )
        return {
            "points1": pos1[i1], "points2": pos2[i2],
            "feats1": np.zeros((self.npoints, 3), np.float32),
            "feats2": np.zeros((self.npoints, 3), np.float32),
            "flow": flow[i1],
            "mask": np.ones(self.npoints, np.float32),
        }


class KittiOdometrySceneflow:
    """Unsupervised refine pairs: frame i with frame i +/- bias."""

    def __init__(self, root: str, npoints: int = 8192, max_bias: int = 1, seed: int = 0):
        self.npoints = npoints
        self.max_bias = max_bias
        self.rng = np.random.default_rng(seed)
        self.paths = sorted(glob.glob(os.path.join(root, "*.bin")))

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, index):
        max_ind = len(self.paths)
        if index <= self.max_bias:
            bias = int(self.rng.integers(1, self.max_bias + 1))
        elif index >= max_ind - self.max_bias:
            bias = int(self.rng.integers(-self.max_bias, 0))
        else:
            bias = int(self.rng.integers(-self.max_bias, self.max_bias + 1))
            if bias == 0:
                bias = 1
        p1 = read_subsample(self.paths[index], 4, self.npoints, self.rng, channels=3)
        p2 = read_subsample(self.paths[index + bias], 4, self.npoints, self.rng, channels=3)
        return {
            "points1": p1.astype(np.float32),
            "points2": p2.astype(np.float32),
            "feats1": np.zeros((self.npoints, 3), np.float32),
            "feats2": np.zeros((self.npoints, 3), np.float32),
        }


class NuScenesFlowPairs:
    """Unsupervised pairs from a nuScenes scene split (sweeps dir)."""

    def __init__(
        self, root: str, scenes_list: str, scene_split_lib: str,
        npoints: int = 8192, max_bias: int = 1, seed: int = 0,
    ):
        self.root = root
        self.npoints = npoints
        self.rng = np.random.default_rng(seed)
        scenes = read_scene_list(scenes_list)
        times_list, fns_list = load_scene_split(scenes, scene_split_lib)
        self.pairs = []
        for times, fns in zip(times_list, fns_list):
            max_ind = len(times)
            ini = 0
            while ini < max_ind - max_bias:
                if ini <= max_bias:
                    bias = int(self.rng.integers(1, max_bias + 1))
                else:
                    bias = int(self.rng.integers(-max_bias, max_bias + 1)) or 1
                self.pairs.append((fns[ini], fns[ini + bias]))
                ini += 1

    def __len__(self):
        return len(self.pairs)

    def __getitem__(self, index):
        f1, f2 = self.pairs[index]
        p1 = read_subsample(os.path.join(self.root, f1), 5, self.npoints, self.rng, channels=3)
        p2 = read_subsample(os.path.join(self.root, f2), 5, self.npoints, self.rng, channels=3)
        return {
            "points1": p1.astype(np.float32),
            "points2": p2.astype(np.float32),
            "feats1": np.zeros((self.npoints, 3), np.float32),
            "feats2": np.zeros((self.npoints, 3), np.float32),
        }

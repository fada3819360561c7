"""Data pipeline (L3): LiDAR readers, window samplers, batching/prefetch."""

from .datasets import (
    Flythings3D,
    KittiInterpolationDataset,
    KittiOdometrySceneflow,
    KittiSceneFlowDataset,
    NuscenesInterpolationDataset,
    NuscenesTripletDataset,
    NuScenesFlowPairs,
    PolyPCIDataset,
    load_scene_split,
    read_scene_list,
)
from .lidar import (
    fps_subsample,
    random_subsample,
    read_kitti_bin,
    read_nuscenes_bin,
    read_result_bin,
    subsample,
)
from .pipeline import Loader, collate, device_put_batches
from .synth import generate_flow_pairs, generate_scenes

__all__ = [
    "Flythings3D",
    "KittiInterpolationDataset",
    "KittiOdometrySceneflow",
    "KittiSceneFlowDataset",
    "NuscenesInterpolationDataset",
    "NuscenesTripletDataset",
    "NuScenesFlowPairs",
    "PolyPCIDataset",
    "load_scene_split",
    "read_scene_list",
    "fps_subsample",
    "random_subsample",
    "read_kitti_bin",
    "read_nuscenes_bin",
    "read_result_bin",
    "subsample",
    "Loader",
    "collate",
    "device_put_batches",
    "generate_flow_pairs",
    "generate_scenes",
]

"""Neural layers (L1 of the reference's layer map, SURVEY.md section 2.1)."""

from . import policy
from .fusion import PointsFusion, PointsFusionMulti, PointsFusionWithFeatures
from .heads import Outputer, Tnet, Wnet
from .layers import (
    Classifier,
    FeaturePropagation,
    FlowEmbedding,
    SetConv,
    SetUpConv,
)
from .mlp import PointMLP, dense
from .norm import BatchNorm, group_norm
from .pointnet2 import (
    FeaturePropagationP2,
    Pointnet2FeatureAbstract,
    SetAbstractionMsg,
)
from .transformer import TransformerLayer

__all__ = [
    "policy",
    "PointsFusion",
    "PointsFusionMulti",
    "PointsFusionWithFeatures",
    "Outputer",
    "Tnet",
    "Wnet",
    "Classifier",
    "FeaturePropagation",
    "FlowEmbedding",
    "SetConv",
    "SetUpConv",
    "PointMLP",
    "dense",
    "BatchNorm",
    "group_norm",
    "FeaturePropagationP2",
    "Pointnet2FeatureAbstract",
    "SetAbstractionMsg",
    "TransformerLayer",
]

"""FlowNet3D building blocks: SetConv, FlowEmbedding, SetUpConv,
FeaturePropagation.

Behavioral spec mirrored from /root/reference/Utils/Layers.py:13-192 (not a
translation: layout is channels-last ``[B, N, C]``, grouping runs on the
static-shape ops layer, and all MLPs are MXU matmuls).

Channel concat orders follow the reference exactly (they define the weight
layout): SetConv/Group emits ``[dxyz, feats]``; FlowEmbedding appends the
query cloud's features last; SetUpConv concats skip features after the
maxpool; FeaturePropagation concats ``[interpolated, skip]``.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .. import ops
from . import policy
from .mlp import PointMLP, dense
from .norm import BatchNorm


def gather_split(xyz, feats, idx):
    """Gather ``[xyz | feats]`` neighbor rows, split by dtype under bf16.

    fp32 policy: ONE fused row gather (the round-2 recipe — per-row cost
    dominates when everything is fp32 anyway).  bf16 policy: geometry
    rides its own 3-channel fp32 gather while features ride bf16 —
    measured @64k x k16: fused 131ch fp32 14.2 ms vs split 3ch fp32 +
    128ch bf16 2.6 ms.  A mixed concat BEFORE the gather would promote
    the whole block to fp32 and silently forfeit the bandwidth win.

    Returns ``(g_xyz [B,S,K,3] fp32, g_feats [B,S,K,D] compute dtype)``.
    """
    if policy.compute_dtype() == jnp.bfloat16:
        g_xyz = ops.index_points(xyz, idx)
        g_feats = ops.index_points(feats.astype(jnp.bfloat16), idx)
        return g_xyz, g_feats
    g = ops.index_points(jnp.concatenate([xyz, feats], -1), idx)
    return g[..., :3], g[..., 3:]


def _setconv_ok(train: bool, nsample: int) -> bool:
    """Route a ball-grouped stage to the fused eval kernel
    (ops/pallas_kernels/setconv_tpu.py).  Module-level so TPU tests can
    monkeypatch it off and compare against the XLA path in-process."""
    return (
        jax.default_backend() == "tpu"
        and not train
        and nsample <= 128
    )


def _knnconv_ok(k_xyz, train: bool) -> bool:
    """Route a kNN-grouped stage to the fused eval kernel
    (ops/pallas_kernels/knnconv_tpu.py): TPU, eval, and a key cloud
    small enough to sit VMEM-resident."""
    return (
        jax.default_backend() == "tpu"
        and not train
        and k_xyz.shape[1] <= 2048
    )


def fold_pointmlp_vars(params, stats, n: int):
    """Folded ``(WT, b, ...)`` layers from a batch-norm PointMLP's param
    and batch_stats dicts (eval running stats -> affine;
    setconv_tpu.fold_bn_layers)."""
    from ..ops.pallas_kernels.setconv_tpu import fold_bn_layers

    return fold_bn_layers(
        [params[f"Dense_{i}"] for i in range(n)],
        [params[f"BatchNorm_{i}"] for i in range(n)],
        [stats[f"BatchNorm_{i}"] for i in range(n)],
    )


def _fold_pointmlp(module: nn.Module, name: str, n: int):
    return fold_pointmlp_vars(
        module.variables["params"][name],
        module.variables["batch_stats"][name], n,
    )


def fps_start(module: nn.Module, xyz, train: bool):
    """Per-sample random FPS start index during training (reference
    parity: Pointnet2Utils.py:76 uses ``torch.randint``); deterministic 0
    at eval or when no ``sample`` rng stream is provided."""
    if train and module.has_rng("sample"):
        B, N, _ = xyz.shape
        return jax.random.randint(module.make_rng("sample"), (B,), 0, N)
    return 0


class SetConv(nn.Module):
    """FPS-sample -> ball-group -> shared MLP -> neighborhood max-pool.

    Mirrors Utils/Layers.py:69-92 (Sample + Group + conv stack).
    """

    npoint: int
    radius: float
    nsample: int
    mlp: Sequence[int]
    # interleaved-parallel FPS on TPU: near-FPS uniformity, ~19x faster
    # at 16k->1024 (latency-bound sequential loop).  True = exact greedy.
    fps_exact: bool = False

    @nn.compact
    def __call__(self, xyz, feats, *, train: bool = False, momentum=0.1):
        """xyz ``[B,N,3]``, feats ``[B,N,D]`` -> (new_xyz ``[B,S,3]``,
        new_feats ``[B,S,C']``).

        On TPU at eval the whole ball-group + MLP + max tail runs as ONE
        fused Pallas kernel with BatchNorm folded into the weights
        (ops/pallas_kernels/setconv_tpu.py).  ``train=True`` (or CPU)
        keeps the XLA expression, which defines gradients and batch
        statistics.  The param tree is identical either way (the fused
        branch materializes it via a dummy PointMLP call).
        """
        new_xyz = ops.fps_points(
            xyz, self.npoint, fps_start(self, xyz, train), exact=self.fps_exact
        )
        if _setconv_ok(train, self.nsample) and not ops.has_tangents(
            xyz, feats, self.variables.get("params", {})
        ):  # no-VJP kernel: XLA fallback when a tangent could flow
            from ..ops.pallas_kernels.setconv_tpu import setconv_fused

            cin = 3 + feats.shape[-1]
            dummy = jnp.zeros((1, cin), policy.compute_dtype())
            _ = PointMLP(self.mlp, norm="batch")(dummy, train=False)
            layers = _fold_pointmlp(self, "PointMLP_0", len(self.mlp))
            pooled = setconv_fused(
                xyz, feats, new_xyz, self.radius, self.nsample,
                layers, len(self.mlp), True,
            )
            return new_xyz, pooled
        idx = ops.ball_query(self.radius, self.nsample, xyz, new_xyz)
        g_xyz, g_feats = gather_split(xyz, feats, idx)
        g_xyz = g_xyz - new_xyz[:, :, None, :]
        h = policy.cast_concat([g_xyz, g_feats])  # [B,S,K,3+D]
        h = PointMLP(self.mlp, norm="batch")(h, train=train, momentum=momentum)
        return new_xyz, jnp.max(h, axis=2)


class FlowEmbedding(nn.Module):
    """Cross-cloud correlation layer (Utils/Layers.py:95-119).

    kNN-groups cloud2 around every cloud1 point, concats both feature sets
    and the offset, then MLP + max-pool -> per-point motion embedding.
    """

    nsample: int
    mlp: Sequence[int]

    @nn.compact
    def __call__(self, xyz1, xyz2, feats1, feats2, *, train=False, momentum=0.1):
        if _knnconv_ok(xyz2, train) and not ops.has_tangents(
            xyz1, xyz2, feats1, feats2, self.variables.get("params", {})
        ):
            from ..ops.pallas_kernels.knnconv_tpu import knnconv_fused

            cin = 3 + feats2.shape[-1] + feats1.shape[-1]
            dummy = jnp.zeros((1, cin), policy.compute_dtype())
            _ = PointMLP(self.mlp, norm="batch")(dummy, train=False)
            layers = _fold_pointmlp(self, "PointMLP_0", len(self.mlp))
            return knnconv_fused(
                xyz1, xyz2, feats2, feats1, None, self.nsample,
                layers, (), len(self.mlp), 0,
            )
        _, idx = ops.knn(xyz1, xyz2, self.nsample)
        g_xyz, g_feats = gather_split(xyz2, feats2, idx)
        g_xyz = g_xyz - xyz1[:, :, None, :]
        f1 = jnp.broadcast_to(
            feats1[:, :, None, :], g_feats.shape[:3] + (feats1.shape[-1],)
        )
        h = policy.cast_concat([g_xyz, g_feats, f1])
        h = PointMLP(self.mlp, norm="batch")(h, train=train, momentum=momentum)
        return jnp.max(h, axis=2)


class SetUpConv(nn.Module):
    """Upsampling set-conv (Utils/Layers.py:122-160).

    kNN-groups coarse features onto dense points, MLP1 + max-pool, then
    concats the dense skip features and applies MLP2.  ``mlp1`` may be
    empty (identity), matching the reference's set_upconv1 config.
    """

    nsample: int
    mlp1: Sequence[int]
    mlp2: Sequence[int]

    @nn.compact
    def __call__(
        self, coarse_xyz, dense_xyz, coarse_feats, dense_feats, *, train=False, momentum=0.1
    ):
        if _knnconv_ok(coarse_xyz, train) and not ops.has_tangents(
            coarse_xyz, dense_xyz, coarse_feats, dense_feats,
            self.variables.get("params", {})
        ):
            from ..ops.pallas_kernels.knnconv_tpu import knnconv_fused

            dt = policy.compute_dtype()
            cin1 = 3 + coarse_feats.shape[-1]
            if self.mlp1:
                _ = PointMLP(self.mlp1, norm="batch", name="conv1")(
                    jnp.zeros((1, cin1), dt), train=False
                )
                l1 = _fold_pointmlp(self, "conv1", len(self.mlp1))
                cm = self.mlp1[-1]
            else:
                l1, cm = (), cin1
            cin2 = cm + dense_feats.shape[-1]
            _ = PointMLP(self.mlp2, norm="batch", name="conv2")(
                jnp.zeros((1, cin2), dt), train=False
            )
            l2 = _fold_pointmlp(self, "conv2", len(self.mlp2))
            return knnconv_fused(
                dense_xyz, coarse_xyz, coarse_feats, None, dense_feats,
                self.nsample, l1, l2, len(self.mlp1), len(self.mlp2),
            )
        _, idx = ops.knn(dense_xyz, coarse_xyz, self.nsample)
        g_xyz, g_feats = gather_split(coarse_xyz, coarse_feats, idx)
        g_xyz = g_xyz - dense_xyz[:, :, None, :]
        h = policy.cast_concat([g_xyz, g_feats])
        if self.mlp1:
            h = PointMLP(self.mlp1, norm="batch", name="conv1")(
                h, train=train, momentum=momentum
            )
        h = jnp.max(h, axis=2)  # [B,N,C]
        h = policy.cast_concat([h, dense_feats])
        h = PointMLP(self.mlp2, norm="batch", name="conv2")(
            h, train=train, momentum=momentum
        )
        return h


class FeaturePropagation(nn.Module):
    """Inverse-distance 3-NN interpolation + MLP (Utils/Layers.py:163-192)."""

    mlp: Sequence[int]

    @nn.compact
    def __call__(
        self, sub_xyz, dense_xyz, sub_feats, dense_feats, *, train=False, momentum=0.1
    ):
        if _knnconv_ok(sub_xyz, train) and not ops.has_tangents(
            sub_xyz, dense_xyz, sub_feats, dense_feats,
            self.variables.get("params", {})
        ):
            from ..ops.pallas_kernels.knnconv_tpu import knnconv_fused

            cin = sub_feats.shape[-1] + dense_feats.shape[-1]
            dummy = jnp.zeros((1, cin), policy.compute_dtype())
            _ = PointMLP(self.mlp, norm="batch")(dummy, train=False)
            layers = _fold_pointmlp(self, "PointMLP_0", len(self.mlp))
            return knnconv_fused(
                dense_xyz, sub_xyz, sub_feats, None, dense_feats, 3,
                (), layers, 0, len(self.mlp), interp=True,
            )
        interp = ops.three_nn_interpolate(dense_xyz, sub_xyz, sub_feats, "clamp")
        h = policy.cast_concat([interp, dense_feats])
        h = PointMLP(self.mlp, norm="batch")(h, train=train, momentum=momentum)
        return h


class Classifier(nn.Module):
    """FlowNet3D's flow regression head (Models/New_Models0.py:40-45):
    Dense(128) + BN + ReLU + Dense(3)."""

    @nn.compact
    def __call__(self, feats, *, train=False, momentum=0.1):
        h = dense(128)(feats)
        h = BatchNorm(eps=1e-3)(h, train=train, momentum=momentum)
        h = nn.relu(h)
        # flow is geometry: leave the bf16 policy at the head boundary
        return policy.f32(dense(3)(h))

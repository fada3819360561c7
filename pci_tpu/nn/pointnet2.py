"""PointNet++ multi-scale-grouping encoder/decoder over flow fields.

Mirrors /root/reference/Utils/Pointnet2Utils.py:206-316 (the GroupNorm(4)
top-level variants used by the live ISAPCInet path) and the
``Pointnet2FeatureAbstract`` wiring at /root/reference/Utils/Layers.py:498-528.

Channel-concat orders preserved: MSG groups emit ``[feats, dxyz]``
(features first — note this differs from FlowNet3D's Group); FP concats
``[skip, interpolated]``.
"""

from __future__ import annotations

import os
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .. import ops
from . import policy
from .layers import fps_start, gather_split
from .mlp import PointMLP, dense
from .norm import group_norm


class SetAbstractionMsg(nn.Module):
    """Multi-scale grouping set abstraction (Pointnet2Utils.py:206-263)."""

    npoint: int
    radius_list: Sequence[float]
    nsample_list: Sequence[int]
    mlp_list: Sequence[Sequence[int]]
    fps_exact: bool = False  # see SetConv.fps_exact

    @nn.compact
    def __call__(self, xyz, feats, *, train=False, momentum=0.1):
        """xyz ``[B,N,3]``, feats ``[B,N,D]`` or None ->
        (new_xyz ``[B,S,3]``, new_feats ``[B,S,sum(mlp[-1])]``)."""
        new_xyz = ops.fps_points(
            xyz, self.npoint, fps_start(self, xyz, train), exact=self.fps_exact
        )
        # all radius scales in one pass: the streamed TPU kernel never
        # materializes the O(S*N) matrix (CPU: one shared matrix); one
        # fused [xyz | feats] gather per scale instead of two row gathers
        # (gather cost is per-row on TPU; see ops/gather.py)
        idx_list = ops.ball_query_multi(
            self.radius_list, self.nsample_list, xyz, new_xyz
        )
        outs = []
        for i, radius in enumerate(self.radius_list):
            idx = idx_list[i]
            if feats is not None:
                g_xyz, g_feats = gather_split(xyz, feats, idx)
                g_xyz = g_xyz - new_xyz[:, :, None, :]
                h = policy.cast_concat([g_feats, g_xyz])
            else:
                h = ops.index_points(xyz, idx) - new_xyz[:, :, None, :]
            h = PointMLP(self.mlp_list[i], norm="group", groups=4, name=f"scale{i}")(
                h, train=train, momentum=momentum
            )
            outs.append(jnp.max(h, axis=2))
        return new_xyz, jnp.concatenate(outs, axis=-1)


class FeaturePropagationP2(nn.Module):
    """3-NN inverse-distance interpolation + GroupNorm(4) MLP
    (Pointnet2Utils.py:266-316)."""

    mlp: Sequence[int]

    @nn.compact
    def __call__(self, dense_xyz, sub_xyz, dense_feats, sub_feats, *, train=False, momentum=0.1):
        """dense_xyz ``[B,N,3]``, sub_xyz ``[B,S,3]``,
        dense_feats ``[B,N,D]`` or None, sub_feats ``[B,S,C]`` -> ``[B,N,C']``."""
        from .layers import _knnconv_ok

        S = sub_xyz.shape[1]
        if S == 1:
            interp = jnp.broadcast_to(
                sub_feats, (dense_xyz.shape[0], dense_xyz.shape[1], sub_feats.shape[-1])
            )
        elif _knnconv_ok(sub_xyz, train):
            # fused kNN + inverse-distance interpolation (the GroupNorm
            # MLP cannot fold, so only the gather-heavy interp fuses)
            from ..ops.pallas_kernels.knnconv_tpu import knnconv_fused

            interp = knnconv_fused(
                dense_xyz, sub_xyz, sub_feats, None, None, 3,
                (), (), 0, 0, interp=True, recip="eps",
            )
        else:
            interp = ops.three_nn_interpolate(dense_xyz, sub_xyz, sub_feats, "eps")
        if dense_feats is not None:
            h = policy.cast_concat([dense_feats, interp])
        else:
            h = interp
        return PointMLP(self.mlp, norm="group", groups=4)(
            h, train=train, momentum=momentum
        )


def _pn2mid_ok(train: bool) -> bool:
    """Route sa2..sa4 + fp4..fp2 (everything on <=1024 points) to the
    single VMEM-resident megakernel (ops/pallas_kernels/pn2mid_tpu.py):
    TPU, eval only.  Module-level so tests can monkeypatch it on (the
    kernel runs in interpreter mode off-TPU)."""
    return (
        jax.default_backend() == "tpu"
        and not train
        and os.environ.get("PCI_TPU_PN2_KERNEL", "1") == "1"
    )


class Pointnet2FeatureAbstract(nn.Module):
    """Full PointNet++ MSG encoder-decoder over a flow cloud
    (Utils/Layers.py:498-528): 4 SA levels (1024/256/64/16 points, dual
    radii) + 4 FP levels + Dense/GroupNorm(8) head."""

    out_channels: int

    @nn.compact
    def __call__(self, xyz, *, train=False, momentum=0.1):
        """xyz ``[B,M,3]`` (flow vectors treated as a cloud) ->
        ``[B,M,out_channels]``."""
        kw = dict(train=train, momentum=momentum)
        sa1 = SetAbstractionMsg(1024, [0.1, 0.2], [16, 32], [[16, 16, 32], [32, 32, 64]], name="sa1")
        sa2 = SetAbstractionMsg(256, [0.2, 0.4], [16, 32], [[64, 64, 128], [64, 96, 128]], name="sa2")
        sa3 = SetAbstractionMsg(64, [0.4, 0.8], [16, 32], [[128, 196, 256], [128, 196, 256]], name="sa3")
        sa4 = SetAbstractionMsg(16, [0.8, 1.6], [16, 32], [[256, 256, 512], [256, 384, 512]], name="sa4")

        l1_xyz, l1_f = sa1(xyz, None, **kw)
        if (
            _pn2mid_ok(train)
            and not self.is_initializing()
            # no-VJP megakernel: XLA fallback when a tangent could flow
            and not ops.has_tangents(
                l1_xyz, l1_f, self.variables.get("params", {})
            )
        ):
            l1_f = self._mid_fused(l1_xyz, l1_f)
        else:
            l2_xyz, l2_f = sa2(l1_xyz, l1_f, **kw)
            l3_xyz, l3_f = sa3(l2_xyz, l2_f, **kw)
            l4_xyz, l4_f = sa4(l3_xyz, l3_f, **kw)

            l3_f = FeaturePropagationP2([256, 256], name="fp4")(l3_xyz, l4_xyz, l3_f, l4_f, **kw)
            l2_f = FeaturePropagationP2([256, 256], name="fp3")(l2_xyz, l3_xyz, l2_f, l3_f, **kw)
            l1_f = FeaturePropagationP2([256, 128], name="fp2")(l1_xyz, l2_xyz, l1_f, l2_f, **kw)
        l0_f = FeaturePropagationP2([128, 128, 128], name="fp1")(xyz, l1_xyz, None, l1_f, **kw)

        h = dense(self.out_channels, name="conv1")(l0_f)
        h = group_norm(8)(h)
        return nn.relu(h)

    def _mid_fused(self, l1_xyz, l1_f):
        """Eval mid-section as ONE kernel (pn2mid_tpu): FPS centers
        in-kernel, ball groups + GN MLPs + slot max + 3-NN interp all
        VMEM-resident; only fp2's [B,1024,128] output leaves."""
        from ..ops.pallas_kernels.pn2mid_tpu import (
            gn_pointmlp_vars,
            pn2mid_fused,
        )

        interpret = jax.default_backend() != "tpu"  # interpreter for tests
        p = self.variables["params"]
        flat = (
            gn_pointmlp_vars(p["sa2"]["scale0"], 3)
            + gn_pointmlp_vars(p["sa2"]["scale1"], 3)
            + gn_pointmlp_vars(p["sa3"]["scale0"], 3)
            + gn_pointmlp_vars(p["sa3"]["scale1"], 3)
            + gn_pointmlp_vars(p["sa4"]["scale0"], 3)
            + gn_pointmlp_vars(p["sa4"]["scale1"], 3)
            + gn_pointmlp_vars(p["fp4"]["PointMLP_0"], 2)
            + gn_pointmlp_vars(p["fp3"]["PointMLP_0"], 2)
            + gn_pointmlp_vars(p["fp2"]["PointMLP_0"], 2)
        )
        return pn2mid_fused(
            l1_xyz, l1_f, flat, (256, 64, 16),
            ((0.2, 0.4), (0.4, 0.8), (0.8, 1.6)),
            ((16, 32), (16, 32), (16, 32)), interpret,
        )

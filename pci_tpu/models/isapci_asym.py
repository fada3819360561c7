"""Asymmetric ISAPCInet variant (channel-concat flows, single key frame).

Behavioral spec from /root/reference/Models/New_Models.py:88-213: separate
forward/backward field counts, per-channel flow concat (3*(f+b) channels),
a channel-wise Tnet (t broadcast to every flow channel, Conv1d MLP,
softmax over channels) weighting the concat, a deep per-point Outputer
(3(f+b)->128->1024->1024->128->3, GroupNorm), and a direct warp of the
key frame — no fusion head.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from ..nn.mlp import dense
from ..nn.norm import group_norm
from .flownet3d import FlowNet3D


class TnetAsym(nn.Module):
    """t broadcast to 3*(f+b) channels -> Conv1d MLP -> softmax over
    channels (New_Models.py:88-122)."""

    forward_field: int
    backward_field: int

    @nn.compact
    def __call__(self, t):
        """t ``[B]`` -> weights ``[B, 3*(f+b)]``."""
        c = 3 * (self.forward_field + self.backward_field)
        h = jnp.broadcast_to(t[:, None], (t.shape[0], c)).astype(jnp.float32)
        for width, groups in ((128, 8), (1024, 64), (1024, 64), (128, 8)):
            h = dense(width)(h)
            h = group_norm(groups)(h)
            h = nn.relu(h)
        h = dense(c)(h)
        return nn.softmax(h, axis=-1)


class OutputerAsym(nn.Module):
    """Deep flow regression head (New_Models.py:125-153)."""

    @nn.compact
    def __call__(self, feats):
        """``[B, N, C] -> [B, N, 3]``."""
        for width, groups in ((128, 8), (1024, 64), (1024, 64), (128, 8)):
            feats = dense(width)(feats)
            feats = group_norm(groups)(feats)
            feats = nn.relu(feats)
        return dense(3)(feats)


class ISAPCInetAsym(nn.Module):
    forward_field: int
    backward_field: int
    freeze_flow: bool = True

    @nn.compact
    def __call__(self, forward_pcds, key_pcd, backward_pcds, t, ini_feature,
                 *, train: bool = False, momentum=0.1):
        """forward_pcds: ``forward_field * [B,N,3]``, key_pcd ``[B,N,3]``,
        backward_pcds: ``backward_field * [B,N,3]``, t ``[B]`` ->
        interpolated cloud ``[B,N,3]`` (key warped by the net flow)."""
        B, N, _ = ini_feature.shape
        flow = FlowNet3D(name="flow")
        flow_train = train and not self.freeze_flow
        t32 = t.astype(jnp.float32)

        # sequential parameter-shared flow calls (narrow calls pipeline
        # better than one wide batched pass on v5e; see ISAPCInet)
        srcs = list(forward_pcds) + [key_pcd] * self.backward_field
        dsts = [key_pcd] * self.forward_field + list(backward_pcds)
        if not flow_train:
            # shared encodings: f+b pairs over f+b+1 distinct clouds (the
            # key frame appears in EVERY pair) — see FlowNet3D.multi
            cl = list(forward_pcds) + [key_pcd] + list(backward_pcds)
            ki = self.forward_field
            pairs = [
                (i, ki) for i in range(self.forward_field)
            ] + [
                (ki, ki + 1 + i) for i in range(self.backward_field)
            ]
            fl = flow.multi(cl, [ini_feature] * len(cl), pairs,
                            train=False, momentum=momentum)
            flow_list = [
                lax.stop_gradient(f) if self.freeze_flow else f for f in fl
            ]
        else:
            flow_list = []
            for s, d in zip(srcs, dsts):
                f = flow(s, d, ini_feature, ini_feature,
                         train=flow_train, momentum=momentum)
                if self.freeze_flow:
                    f = lax.stop_gradient(f)
                flow_list.append(f)
        # channel concat: [B, N, 3*(f+b)] in pair order
        input_flows = jnp.concatenate(flow_list, axis=-1)

        weights = TnetAsym(self.forward_field, self.backward_field, name="tnet")(t32)
        weighted = input_flows * weights[:, None, :]

        res_flow = OutputerAsym(name="outputer")(weighted)
        return key_pcd + res_flow * t32[:, None, None]

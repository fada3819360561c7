"""Time-conditioning and output heads.

Mirrors /root/reference/Utils/Layers.py:446-547:
  * ``Tnet``: t -> softmax weights over the 2*field flow candidates
  * ``Wnet``: t -> softmax weights over 6*field channels (PointINet2)
  * ``Outputer``: flow regression head

All are 1x1-conv MLPs with GroupNorm(C/8); in channels-last they are
Dense stacks (a conv over a length-1 spatial dim is just a matmul).
"""

from __future__ import annotations

import flax.linen as nn

from . import policy
from .mlp import dense
from .norm import group_norm


class Tnet(nn.Module):
    """t ``[B, 1]`` -> softmax weights ``[B, 2*field]``."""

    field: int

    @nn.compact
    def __call__(self, t):
        h = t
        for width in (64, 256, 256, 64):
            h = dense(width)(h)
            h = group_norm(width // 8)(h)
            h = nn.relu(h)
        h = dense(2 * self.field)(h)
        return nn.softmax(policy.f32(h), axis=-1)


class Wnet(nn.Module):
    """t ``[B, 1]`` -> softmax weights ``[B, 6*field]``."""

    field: int

    @nn.compact
    def __call__(self, t):
        h = t
        for width in (128, 512, 512, 128):
            h = dense(width)(h)
            h = group_norm(width // 8)(h)
            h = nn.relu(h)
        h = dense(6 * self.field)(h)
        return nn.softmax(policy.f32(h), axis=-1)


class Outputer(nn.Module):
    """Per-point flow regression: ``[B, N, C] -> [B, N, 3]``."""

    @nn.compact
    def __call__(self, feats):
        h = dense(128)(feats)
        h = group_norm(16)(h)
        h = nn.relu(h)
        h = dense(32)(h)
        h = group_norm(4)(h)
        h = nn.relu(h)
        # flow is geometry: fp32 at the head boundary
        return policy.f32(dense(3)(h))

"""Pointwise (1x1-conv) MLP stacks.

Every "conv" in the reference is a 1x1 convolution — i.e. a Dense layer
over the channel axis.  Channels-last layout means each layer is a single
MXU matmul over ``[..., C_in] @ [C_in, C_out]``.

Norm flavors match the reference call sites:
  * ``batch``  — Conv+BatchNorm(eps=1e-3)+ReLU (FlowNet3D, PointsFusion)
  * ``group``  — Conv+GroupNorm(fixed groups)+ReLU (PointNet++ MSG/FP)
  * ``group_div`` — GroupNorm with C/div groups (PointsFusion2, Tnet/Wnet)
  * ``none``   — bare Dense
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from . import policy
from .norm import BatchNorm, group_norm

xavier_uniform = nn.initializers.xavier_uniform()


def dense(features: int, use_bias: bool = True, name: str | None = None):
    """Dense layer with the reference's declared init (xavier + zero bias).

    Computes in the active :mod:`policy` dtype (params stay fp32; flax
    casts both operands per-matmul when the policy is bf16).
    """
    return nn.Dense(
        features,
        use_bias=use_bias,
        kernel_init=xavier_uniform,
        bias_init=nn.initializers.zeros,
        dtype=policy.compute_dtype(),
        param_dtype=jnp.float32,
        name=name,
    )


class PointMLP(nn.Module):
    """Stack of Dense -> norm -> ReLU over the trailing channel axis."""

    features: Sequence[int]
    norm: str = "batch"  # batch | group | group_div | none
    groups: int = 4  # fixed group count for norm='group'
    groups_div: int = 8  # C // groups_div groups for norm='group_div'
    bn_eps: float = 1e-3
    final_act: bool = True  # apply norm+relu after the last layer too

    @nn.compact
    def __call__(self, x, *, train: bool = False, momentum=0.1):
        n = len(self.features)
        for i, f in enumerate(self.features):
            x = dense(f)(x)
            last = i == n - 1
            if last and not self.final_act:
                break
            if self.norm == "batch":
                x = BatchNorm(eps=self.bn_eps)(x, train=train, momentum=momentum)
            elif self.norm == "group":
                x = group_norm(self.groups)(x)
            elif self.norm == "group_div":
                x = group_norm(max(f // self.groups_div, 1))(x)
            elif self.norm != "none":
                raise ValueError(f"unknown norm {self.norm!r}")
            x = nn.relu(x)
        return x

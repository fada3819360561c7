"""Normalization layers.

The reference mixes torch ``BatchNorm*(eps=1e-3)`` inside FlowNet3D with
``GroupNorm`` in the heads, and *schedules BN momentum over epochs*
(train.py:82-87).  Torch fixes momentum at construction; here momentum is a
call-time (traceable) argument so the schedule never triggers a recompile.

Semantics mirrored from torch:
  * normalization uses biased batch variance,
  * running-var updates use the unbiased estimate,
  * ``running = (1 - m) * running + m * batch``.

Cross-replica: under ``shard_map`` pass ``axis_name`` to reduce batch
statistics over the mesh; under plain jit-with-sharding the global mean is
already global.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax


class BatchNorm(nn.Module):
    """Torch-compatible BatchNorm over the trailing channel axis.

    Input ``[..., C]``; statistics reduce over all leading axes.
    """

    eps: float = 1e-3
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, *, train: bool, momentum=0.1):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((C,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((C,), jnp.float32)
        )

        if train:
            red = tuple(range(x.ndim - 1))
            x32 = x.astype(jnp.float32)
            mean = jnp.mean(x32, axis=red)
            mean2 = jnp.mean(x32**2, axis=red)
            if self.axis_name is not None:
                mean = lax.pmean(mean, self.axis_name)
                mean2 = lax.pmean(mean2, self.axis_name)
            var = jnp.maximum(mean2 - mean**2, 0.0)
            n = x.size // C
            if self.axis_name is not None:
                n = n * lax.axis_size(self.axis_name)
            unbiased = var * (n / max(n - 1, 1))
            if not self.is_initializing():
                m = jnp.asarray(momentum, jnp.float32)
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean) * lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(x.dtype)


def group_norm(num_groups: int) -> nn.GroupNorm:
    """Torch-default GroupNorm (eps=1e-5) over the trailing channel axis.

    ``dtype`` follows the activation policy: flax's ``_compute_stats``
    always accumulates mean/var in fp32, so a bf16 policy only affects
    the output dtype (keeps a bf16 chain bf16 through the norm); params
    stay fp32.
    """
    from . import policy

    return nn.GroupNorm(
        num_groups=num_groups,
        epsilon=1e-5,
        dtype=policy.compute_dtype(),
        param_dtype=jnp.float32,
    )

"""Train state and optimizer construction.

Mirrors the reference's training config (train.py:18-48, 68-87):
Adam + ClippedStepLR, BN-momentum schedule, freeze-flow semantics
(``requires_grad=False`` on the FlowNet3D subtree -> optax mask here).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


def clipped_step_lr(init_lr: float, step_size: int, gamma: float, min_lr: float):
    """lr(epoch) = max(init * gamma^(epoch // step_size), min_lr) —
    the reference's ClippedStepLR (Utils/Utils.py:22-31).  Returns an
    epoch-indexed schedule function."""

    def schedule(epoch):
        e = jnp.asarray(epoch, jnp.float32)
        return jnp.maximum(init_lr * gamma ** jnp.floor(e / step_size), min_lr)

    return schedule


def bn_momentum_schedule(init: float = 0.5, gamma: float = 0.5, step_size: int = 100, floor: float = 0.01):
    """The reference's BN-momentum decay (train.py:82-87)."""

    def schedule(epoch):
        e = jnp.asarray(epoch, jnp.float32)
        return jnp.maximum(init * gamma ** jnp.floor(e / step_size), floor)

    return schedule


def make_optimizer(
    learning_rate, params, freeze_subtrees: tuple[str, ...] = ()
) -> optax.GradientTransformation:
    """Adam with optional frozen parameter subtrees.

    A subtree name matches at ANY nesting level ("flow" freezes both
    ISAPCInet's ``flow`` and PointINet2's nested ``pointinet/flow``),
    mirroring the reference's ``requires_grad=False`` propagation."""
    if not freeze_subtrees:
        return optax.adam(learning_rate)

    def label(params_):
        def build(subtree, prefix):
            if isinstance(subtree, dict):
                return {k: build(v, prefix + (k,)) for k, v in subtree.items()}
            return (
                "frozen"
                if any(k in freeze_subtrees for k in prefix)
                else "train"
            )

        return build(params_, ())

    return optax.multi_transform(
        {"train": optax.adam(learning_rate), "frozen": optax.set_to_zero()},
        label,
    )


def freeze_params(params, freeze_subtrees: tuple[str, ...] = ()):
    """``stop_gradient`` every frozen subtree (same any-nesting-level
    matching as :func:`make_optimizer`).

    Apply this INSIDE the differentiated loss fn: tangents die at the
    source, so (a) XLA never computes the frozen subtree's cotangents
    (the optimizer would zero them anyway) and (b) the frozen
    submodule's eval-routed Pallas kernels — which define no VJP — stay
    routable under ``jax.grad`` (the r5 bench_train crash: flow runs
    train=False inside the fine-tune step, routes the flowenc/flowmid
    megakernels, and the full-param-tree grad sent tangents into them).
    """
    if not freeze_subtrees:
        return params

    def build(subtree, prefix):
        if isinstance(subtree, dict):
            return {k: build(v, prefix + (k,)) for k, v in subtree.items()}
        if any(k in freeze_subtrees for k in prefix):
            return jax.lax.stop_gradient(subtree)
        return subtree

    return build(params, ())


def create_train_state(params, batch_stats, optimizer) -> TrainState:
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )

"""Jitted train / eval step builders.

One jitted step is the whole per-batch path of the reference's train loop
(train.py:101-132): forward, chamfer loss, backward, Adam update, BN
running-stat update — no host round trips inside an epoch.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from .. import ops
from .state import TrainState, freeze_params


def make_interp_train_step(
    model, optimizer: optax.GradientTransformation, remat: bool = False,
    mesh=None, freeze_subtrees: tuple[str, ...] = (),
) -> Callable:
    """Train step for interpolation models (ISAPCInet / PointINet2 style
    batches: forward/key/backward frame lists + t + gt).

    Returns ``step(state, batch, rng, momentum) -> (state, metrics)``;
    jit once and reuse — the BN momentum enters as a traced scalar (the
    lr schedule lives inside the optax optimizer).

    ``remat=True`` rematerializes the forward pass in the backward
    (jax.checkpoint): ~2x activation-memory headroom for bigger
    batches/clouds at the cost of a second forward.

    ``mesh``: a ``(data, points)`` mesh whose ``points`` axis is >1
    switches the chamfer LOSS to the ring-exchange sharded kernel
    (parallel.ring) — key shards ride the ICI ring via ppermute instead
    of GSPMD all-gathering the [N, N] distance matrix.  Gradients match
    the single-device loss (tests/test_parallel.py).

    ``freeze_subtrees``: param subtrees to ``stop_gradient`` inside the
    loss (pass the same tuple given to ``make_optimizer``) — kills the
    frozen subtrees' cotangent compute AND keeps their eval-routed
    Pallas megakernels routable under grad (see state.freeze_params).
    """
    ring_points = (
        mesh is not None
        and "points" in mesh.axis_names
        and mesh.shape["points"] > 1
    )

    def step(state: TrainState, batch, rng, momentum):
        def fwd(params, forward, keys, backward, t, ini, key):
            return model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                forward, keys, backward, t, ini,
                train=True, momentum=momentum,
                rngs={"sample": key},
                mutable=["batch_stats"],
            )

        if remat:
            fwd = jax.checkpoint(fwd)

        def loss_fn(params):
            params = freeze_params(params, freeze_subtrees)
            out, new_vars = fwd(
                params, batch["forward"], batch["keys"], batch["backward"],
                batch["t"], batch["ini"], rng,
            )
            if ring_points:
                from ..parallel.ring import chamfer_distance_sharded

                loss = chamfer_distance_sharded(out, batch["gt"], mesh)
            else:
                loss = ops.chamfer_distance(out, batch["gt"])
            return loss, new_vars["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            step=state.step + 1,
        )
        return new_state, {"loss": loss}

    return step


def make_interp_eval_step(model) -> Callable:
    """Eval step: forward + per-sample chamfer (test.py:64-87 semantics)."""

    def step(state: TrainState, batch, rng):
        out = model.apply(
            state.variables,
            batch["forward"], batch["keys"], batch["backward"],
            batch["t"], batch["ini"],
            train=False,
            rngs={"sample": rng},
        )
        return ops.chamfer_per_sample(out, batch["gt"]), out

    return step


def make_sceneflow_train_step(
    model, optimizer: optax.GradientTransformation, supervised: bool,
    remat: bool = False,
) -> Callable:
    """FlowNet3D pretraining step (train_sceneflow.py:49-208).

    supervised=True:  masked L2 flow criterion on (points, gt flow) pairs.
    supervised=False: unsupervised refine — chamfer(points1 + flow, points2).
    ``remat`` rematerializes the forward in the backward (jax.checkpoint).
    """

    def step(state: TrainState, batch, momentum):
        def fwd(params, p1, p2, f1, f2):
            return model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                p1, p2, f1, f2,
                train=True, momentum=momentum,
                mutable=["batch_stats"],
            )

        if remat:
            fwd = jax.checkpoint(fwd)

        def loss_fn(params):
            flow, new_vars = fwd(
                params, batch["points1"], batch["points2"],
                batch["feats1"], batch["feats2"],
            )
            if supervised:
                loss = flow_criterion(flow, batch["flow"], batch["mask"])
            else:
                loss = ops.chamfer_distance(batch["points1"] + flow, batch["points2"])
            return loss, new_vars["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params, batch_stats=new_bs, opt_state=new_opt,
            step=state.step + 1,
        )
        return new_state, {"loss": loss}

    return step


def flow_criterion(pred_flow, flow, mask):
    """Masked L2/2 flow loss (reference models/utils.py:34-36), channels-last."""
    sq = jnp.sum((pred_flow - flow) ** 2, axis=-1)
    return jnp.mean(mask * sq / 2.0)

"""Shared CLI plumbing: model/optimizer/state construction, checkpoint
composition, the epoch loop driver.

Flag sets mirror the reference scripts' argparse blocks
(train.py:18-48, test.py:16-32, PointINet20230424/train_sceneflow.py:15-39)
minus their defects (hard-coded wandb keys, broken imports).
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from ..data import Loader
from ..models import ISAPCInet
from ..train import (
    BestKeeper,
    MetricLogger,
    bn_momentum_schedule,
    clipped_step_lr,
    create_train_state,
    load_flow_into,
    load_params,
    make_interp_train_step,
    make_optimizer,
)


def drain_losses(logger, pending, total, count, key="train_loss"):
    """Flush device-side pending losses to the host/logger in one batch
    (the per-step ``float()`` sync stalls the async dispatch pipeline).
    Returns the updated ``(total, count, pending)`` accumulator triple."""
    for loss in map(float, pending):
        logger.log({key: loss})
        total += loss
        count += 1
    return total, count, []


def jit_init(model, rngs, *args, **kwargs):
    """``model.init`` under jit: eager flax init on the TPU tunnel
    dispatches every op separately (~28 ms each -> minutes for a full
    model); one compiled program initializes in seconds."""
    return jax.jit(lambda: model.init(rngs, *args, **kwargs))()


def add_common_train_flags(p: argparse.ArgumentParser):
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--epochs", type=int, default=500)
    p.add_argument("--init_lr", type=float, default=0.01)
    p.add_argument("--min_lr", type=float, default=1e-6)
    p.add_argument("--step_size_lr", type=int, default=100)
    p.add_argument("--gamma_lr", type=float, default=0.9)
    p.add_argument("--init_bn_momentum", type=float, default=0.5)
    p.add_argument("--min_bn_momentum", type=float, default=0.01)
    p.add_argument("--step_size_bn_momentum", type=int, default=100)
    p.add_argument("--gamma_bn_momentum", type=float, default=0.5)
    p.add_argument("--use_wandb", action="store_true")
    p.add_argument("--log_dir", type=str, default="./logs")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log_every", type=int, default=10,
                   help="sync loss device->host every N steps (per-step "
                        "sync would stall the async dispatch pipeline)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize the forward in the backward "
                        "(jax.checkpoint): ~2x activation-memory headroom "
                        "for bigger batches/clouds at one extra forward")
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="activation compute dtype (nn/policy.py): bf16 "
                        "halves the HBM-bound [B,N,k,C] tensor traffic; "
                        "params + geometry + norm stats stay fp32")


def apply_compute_dtype(args) -> None:
    """Set the activation policy from the common flag BEFORE any model is
    built (the dtype is read at trace time)."""
    from ..nn import policy

    policy.set_compute_dtype(getattr(args, "compute_dtype", "float32"))


def add_nuscenes_flags(p: argparse.ArgumentParser):
    p.add_argument("--root", type=str, required=True)
    p.add_argument("--scenes_list", type=str, required=True)
    p.add_argument("--scene_split_lib", type=str, required=True)
    p.add_argument("--field", type=int, default=2)
    p.add_argument("--npoints", type=int, default=16000)
    p.add_argument("--interval", type=int, default=5)
    p.add_argument("--if_random", action="store_true", default=False)
    p.add_argument("--random_times", type=int, default=1)
    p.add_argument("--sample_method", type=str, default="fps", choices=["fps", "random"])


def add_model_flags(p: argparse.ArgumentParser):
    p.add_argument("--freeze", type=int, default=1)
    p.add_argument("--ff_out_c", type=int, default=64)
    p.add_argument("--tr_out_c", type=int, default=64)
    p.add_argument("--use_tnet", type=int, default=1)
    p.add_argument("--pretrained_flow_model", type=str, default=None)
    p.add_argument("--pretrained_self_model", type=str, default=None)
    p.add_argument("--save_dir", type=str, default="./result_models")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest full-state checkpoint in "
                        "save_dir (params + optimizer state + step — the "
                        "reference loses both on restart)")


def build_isapci(args, batch_example):
    """Construct model + initialized variables, composing pretrained
    checkpoints like the reference (flow first, then full)."""
    model = ISAPCInet(
        field=args.field,
        ff_out_c=args.ff_out_c,
        tr_out_c=args.tr_out_c,
        use_tnet=bool(args.use_tnet),
        freeze_flow=bool(args.freeze),
    )
    rngs = {"params": jax.random.key(args.seed), "sample": jax.random.key(args.seed + 1)}
    variables = jit_init(
        model, rngs,
        batch_example["forward"], batch_example["keys"], batch_example["backward"],
        batch_example["t"], batch_example["ini"], train=False,
    )
    if args.pretrained_flow_model:
        variables = load_flow_into(variables, args.pretrained_flow_model)
    if args.pretrained_self_model:
        variables = load_params(args.pretrained_self_model, variables)
    return model, variables


def build_pointinet2(args, batch_example):
    """PointINet2 (Models/Models.py:130-188) with the same checkpoint
    composition as ISAPCInet."""
    from ..models import PointINet2

    model = PointINet2(field=args.field, freeze_flow=bool(args.freeze))
    rngs = {"params": jax.random.key(args.seed), "sample": jax.random.key(args.seed + 1)}
    variables = jit_init(
        model, rngs,
        batch_example["forward"], batch_example["keys"], batch_example["backward"],
        batch_example["t"], batch_example["ini"], train=False,
    )
    if args.pretrained_flow_model:
        variables = load_flow_into(variables, args.pretrained_flow_model)
    if args.pretrained_self_model:
        variables = load_params(args.pretrained_self_model, variables)
    return model, variables


def batch_to_device(batch):
    return jax.tree_util.tree_map(jnp.asarray, batch)


def example_from_loader(dataset):
    from ..data import collate

    return batch_to_device(collate([dataset[0]]))


def run_interp_training(args, model, variables, dataset):
    """The reference's epoch loop (train.py:91-145): jitted step, epoch
    schedules, best-checkpoint saving."""
    loader = Loader(
        dataset, args.batch_size, shuffle=True, num_workers=8, seed=args.seed
    )
    optimizer = make_optimizer(
        args.init_lr, variables["params"],
        freeze_subtrees=("flow",) if args.freeze else (),
    )
    # lr schedule enters through optax scale-by-schedule: rebuild optimizer
    # with the schedule over epochs mapped from the step counter
    steps_per_epoch = max(len(loader), 1)
    lr_sched = clipped_step_lr(args.init_lr, args.step_size_lr, args.gamma_lr, args.min_lr)
    mom_sched = bn_momentum_schedule(
        args.init_bn_momentum, args.gamma_bn_momentum,
        args.step_size_bn_momentum, args.min_bn_momentum,
    )
    optimizer = make_optimizer(
        lambda step: lr_sched(step // steps_per_epoch),
        variables["params"],
        freeze_subtrees=("flow",) if args.freeze else (),
    )
    state = create_train_state(variables["params"], variables["batch_stats"], optimizer)

    start_epoch = 0
    state_dir = os.path.join(args.save_dir, "state")
    if getattr(args, "resume", False):
        from ..train import load_checkpoint

        try:
            state = load_checkpoint(state_dir, state)
            start_epoch = int(state.step) // steps_per_epoch
            print(f"resumed from {state_dir} at epoch {start_epoch}")
        except FileNotFoundError:
            print(f"no checkpoint under {state_dir}; starting fresh")

    step_fn = jax.jit(
        make_interp_train_step(
            model, optimizer, remat=bool(getattr(args, "remat", False)),
            freeze_subtrees=("flow",) if args.freeze else (),
        ),
        donate_argnums=(0,),
    )

    logger = MetricLogger(args.log_dir, use_wandb=args.use_wandb, config=vars(args))
    keeper = BestKeeper(args.save_dir, prefix=f"field_{args.field}")
    rng = jax.random.key(args.seed + 2)

    log_every = int(getattr(args, "log_every", 10))

    for epoch in range(start_epoch, args.epochs):
        momentum = jnp.asarray(float(mom_sched(epoch)))
        total, count = 0.0, 0
        t_epoch = time.time()
        # Device-side loss accumulation: float(metrics["loss"]) every step
        # would block on a device->host fetch (~28 ms through the TPU
        # tunnel) inside the hot loop.  Keep losses as device arrays and
        # sync every `log_every` steps.
        pending, t_window = [], time.time()
        for batch in loader:
            batch = batch_to_device(batch)
            rng, sub = jax.random.split(rng)
            state, metrics = step_fn(state, batch, sub, momentum)
            pending.append(metrics["loss"])
            if len(pending) >= log_every:
                dt = (time.time() - t_window) / len(pending)
                for loss in map(float, pending):
                    logger.log({"current_train_loss": loss, "time_per_step": dt})
                    total += loss
                    count += 1
                pending, t_window = [], time.time()
        if pending:
            dt = (time.time() - t_window) / len(pending)
            for loss in map(float, pending):
                logger.log({"current_train_loss": loss, "time_per_step": dt})
                total += loss
                count += 1
        epoch_loss = total / max(count, 1)
        logger.log({"epochs": epoch, "epoch_loss": epoch_loss})
        print(f"Epoch {epoch + 1} finished, loss = {epoch_loss:.6f} "
              f"({time.time() - t_epoch:.1f}s)")
        saved = keeper.update(
            {"params": state.params, "batch_stats": state.batch_stats},
            epoch, epoch_loss,
        )
        if saved:
            print(f"Best train loss: {keeper.best:.4f} -> saved {saved}")
        from ..train import save_checkpoint

        save_checkpoint(state_dir, state, epoch, loss=epoch_loss)
    logger.close()
    return state

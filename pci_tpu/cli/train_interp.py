"""Train the PointINet fusion head (flow frozen) on interpolation triplets.

Mirror of PointINet20230424/train_interp.py:46-122.

  python -m pci_tpu.cli.train_interp --dataset_name kitti \
      --root <kitti seq dir> --npoints 16384 --interval 5
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from .. import ops
from ..data import KittiInterpolationDataset, Loader, NuscenesTripletDataset
from ..models import PointINet
from ..train import (
    BestKeeper,
    MetricLogger,
    TrainState,
    bn_momentum_schedule,
    clipped_step_lr,
    create_train_state,
    load_flow_into,
    make_optimizer,
)
from .common import add_common_train_flags, batch_to_device, drain_losses, jit_init


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train PointINet fusion (pci_tpu)")
    add_common_train_flags(p)
    p.add_argument("--dataset_name", type=str, default="kitti", choices=["kitti", "nuscenes"])
    p.add_argument("--root", type=str, required=True)
    p.add_argument("--scenes_list", type=str, default=None)
    p.add_argument("--scene_split_lib", type=str, default=None)
    p.add_argument("--npoints", type=int, default=16384)
    p.add_argument("--interval", type=int, default=5)
    p.add_argument("--use_intensity", type=int, default=1)
    p.add_argument("--freeze", type=int, default=1)
    p.add_argument("--pretrained_flow_model", type=str, default=None)
    p.add_argument("--save_dir", type=str, default="./interp_models")
    return p.parse_args(argv)


def make_train_step(model, optimizer, remat: bool = False,
                    freeze_subtrees: tuple[str, ...] = ()):
    def step(state, batch, rng, momentum):
        def fwd(params, ini_pc, end_pc, color, t, rng):
            return model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                ini_pc, end_pc, color, color, t,
                train=True, momentum=momentum,
                rngs={"sample": rng}, mutable=["batch_stats"],
            )

        if remat:
            fwd = jax.checkpoint(fwd)

        def loss_fn(params):
            params = freeze_params(params, freeze_subtrees)
            out, new_vars = fwd(
                params, batch["ini_pc"], batch["end_pc"], batch["color"],
                batch["t"], rng,
            )
            loss = ops.chamfer_distance(out[..., :3], batch["mid_pc"][..., :3])
            return loss, new_vars["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        import optax

        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params=new_params, batch_stats=new_bs,
                       opt_state=new_opt, step=state.step + 1),
            {"loss": loss},
        )

    return step


def main(argv=None):
    args = parse_args(argv)
    from .common import apply_compute_dtype
    apply_compute_dtype(args)
    if args.dataset_name == "kitti":
        dataset = KittiInterpolationDataset(
            args.root, npoints=args.npoints, interval=args.interval,
            train=True, use_intensity=bool(args.use_intensity), seed=args.seed,
        )
    else:
        dataset = NuscenesTripletDataset(
            args.root, args.scenes_list, args.scene_split_lib,
            npoints=args.npoints, interval=args.interval, train=True,
            use_intensity=bool(args.use_intensity), seed=args.seed,
        )
    loader = Loader(dataset, args.batch_size, shuffle=True, num_workers=8, seed=args.seed)

    model = PointINet(freeze_flow=bool(args.freeze))
    sample = batch_to_device({k: v[None] for k, v in dataset[0].items()})
    rngs = {"params": jax.random.key(args.seed), "sample": jax.random.key(args.seed + 1)}
    variables = jit_init(
        model, rngs, sample["ini_pc"], sample["end_pc"],
        sample["color"], sample["color"], sample["t"], train=False,
    )
    if args.pretrained_flow_model:
        variables = load_flow_into(variables, args.pretrained_flow_model)

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
    step_fn = jax.jit(make_train_step(model, optimizer, remat=args.remat,
                                      freeze_subtrees=("flow",) if args.freeze else ()),
                      donate_argnums=(0,))

    logger = MetricLogger(args.log_dir, use_wandb=args.use_wandb, config=vars(args))
    keeper = BestKeeper(args.save_dir, prefix="interp")
    rng = jax.random.key(args.seed + 2)

    for epoch in range(args.epochs):
        momentum = jnp.asarray(float(mom_sched(epoch)))
        # device-side accumulation: sync (float()) only every log_every
        # steps so the async dispatch pipeline never stalls (VERDICT #8)
        total, count, pending = 0.0, 0, []
        for batch in loader:
            batch = batch_to_device(batch)
            rng, sub = jax.random.split(rng)
            state, metrics = step_fn(state, batch, sub, momentum)
            pending.append(metrics["loss"])
            if len(pending) >= args.log_every:
                total, count, pending = drain_losses(logger, pending, total, count)
        total, count, pending = drain_losses(logger, pending, total, count)
        epoch_loss = total / max(count, 1)
        print(f"Epoch {epoch + 1}: loss {epoch_loss:.6f}")
        saved = keeper.update(
            {"params": state.params, "batch_stats": state.batch_stats}, epoch, epoch_loss
        )
        if saved:
            print(f"saved {saved}")
    logger.close()


if __name__ == "__main__":
    main()

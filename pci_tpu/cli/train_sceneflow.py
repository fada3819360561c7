"""FlowNet3D pretraining — supervised (FlyThings3D / KITTI scene flow) or
unsupervised refine (KITTI odometry / nuScenes pairs).

Mirror of PointINet20230424/train_sceneflow.py:15-220.

  python -m pci_tpu.cli.train_sceneflow --train_type init \
      --dataset_name flythings --root <npz dir> --npoints 2048
  python -m pci_tpu.cli.train_sceneflow --train_type refine \
      --dataset_name kitti_odometry --root <bin dir> --max_bias 1
"""

from __future__ import annotations

import argparse

import numpy as np

import jax
import jax.numpy as jnp

from ..data import (
    Flythings3D,
    KittiOdometrySceneflow,
    KittiSceneFlowDataset,
    Loader,
    NuScenesFlowPairs,
)
from ..models import FlowNet3D
from ..train import (
    BestKeeper,
    MetricLogger,
    bn_momentum_schedule,
    clipped_step_lr,
    create_train_state,
    make_optimizer,
    make_sceneflow_train_step,
)
from .common import add_common_train_flags, batch_to_device, drain_losses, jit_init


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="FlowNet3D pretraining (pci_tpu)")
    add_common_train_flags(p)
    p.add_argument("--train_type", type=str, default="init", choices=["init", "refine"])
    p.add_argument("--dataset_name", type=str, default="flythings",
                   choices=["flythings", "kitti_sceneflow", "kitti_odometry", "nuscenes"])
    p.add_argument("--root", type=str, required=True)
    p.add_argument("--scenes_list", type=str, default=None)
    p.add_argument("--scene_split_lib", type=str, default=None)
    p.add_argument("--npoints", type=int, default=8192)
    p.add_argument("--max_bias", type=int, default=1)
    p.add_argument("--save_dir", type=str, default="./pretrain_models")
    p.add_argument("--pretrained_model", type=str, default=None)
    return p.parse_args(argv)


def build_dataset(args):
    if args.dataset_name == "flythings":
        return Flythings3D(args.root, npoints=args.npoints, train=True, seed=args.seed)
    if args.dataset_name == "kitti_sceneflow":
        return KittiSceneFlowDataset(args.root, npoints=args.npoints, seed=args.seed)
    if args.dataset_name == "kitti_odometry":
        return KittiOdometrySceneflow(
            args.root, npoints=args.npoints, max_bias=args.max_bias, seed=args.seed
        )
    return NuScenesFlowPairs(
        args.root, args.scenes_list, args.scene_split_lib,
        npoints=args.npoints, max_bias=args.max_bias, seed=args.seed,
    )


def main(argv=None):
    args = parse_args(argv)
    from .common import apply_compute_dtype
    apply_compute_dtype(args)
    supervised = args.train_type == "init"
    dataset = build_dataset(args)
    loader = Loader(dataset, args.batch_size, shuffle=True, num_workers=8, seed=args.seed)

    model = FlowNet3D()
    sample = batch_to_device(
        {k: v[None] for k, v in dataset[0].items()}
    )
    variables = jit_init(
        model, jax.random.key(args.seed),
        sample["points1"], sample["points2"], sample["feats1"], sample["feats2"],
        train=True,
    )
    if args.pretrained_model:
        from ..train import load_params

        variables = load_params(args.pretrained_model, variables)

    steps_per_epoch = max(len(loader), 1)
    lr_sched = clipped_step_lr(args.init_lr, args.step_size_lr, args.gamma_lr, args.min_lr)
    mom_sched = bn_momentum_schedule(
        args.init_bn_momentum, args.gamma_bn_momentum,
        args.step_size_bn_momentum, args.min_bn_momentum,
    )
    optimizer = make_optimizer(
        lambda step: lr_sched(step // steps_per_epoch), variables["params"]
    )
    state = create_train_state(variables["params"], variables["batch_stats"], optimizer)
    step_fn = jax.jit(
        make_sceneflow_train_step(
            model, optimizer, supervised, remat=bool(getattr(args, "remat", False))
        ),
        donate_argnums=(0,)
    )

    logger = MetricLogger(args.log_dir, use_wandb=args.use_wandb, config=vars(args))
    keeper = BestKeeper(args.save_dir, prefix=f"flownet3d_{args.dataset_name}")

    for epoch in range(args.epochs):
        momentum = jnp.asarray(float(mom_sched(epoch)))
        # sync every log_every steps, not per step (VERDICT #8)
        total, count, pending = 0.0, 0, []
        for batch in loader:
            batch = batch_to_device(batch)
            state, metrics = step_fn(state, batch, momentum)
            pending.append(metrics["loss"])
            if len(pending) >= args.log_every:
                total, count, pending = drain_losses(logger, pending, total, count)
        total, count, pending = drain_losses(logger, pending, total, count)
        epoch_loss = total / max(count, 1)
        print(f"Epoch {epoch + 1}: loss {epoch_loss:.6f}")
        logger.log({"epochs": epoch, "epoch_loss": epoch_loss})
        saved = keeper.update(
            {"params": state.params, "batch_stats": state.batch_stats},
            epoch, epoch_loss,
        )
        if saved:
            print(f"saved {saved}")
    logger.close()


if __name__ == "__main__":
    main()

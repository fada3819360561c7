"""Evaluate PointINet CD and EMD on interpolation triplets.

Mirror of PointINet20230424/test.py:27-87.
"""

from __future__ import annotations

import argparse

import numpy as np

import jax

from .. import ops
from ..data import KittiInterpolationDataset, Loader, NuscenesTripletDataset
from ..models import PointINet
from ..train import MetricLogger, load_flow_into, load_params
from .common import batch_to_device, jit_init


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Eval PointINet (pci_tpu)")
    p.add_argument("--dataset_name", type=str, default="kitti", choices=["kitti", "nuscenes"])
    p.add_argument("--root", type=str, required=True)
    p.add_argument("--scenes_list", type=str, default=None)
    p.add_argument("--scene_split_lib", type=str, default=None)
    p.add_argument("--npoints", type=int, default=16384)
    p.add_argument("--interval", type=int, default=5)
    p.add_argument("--use_intensity", type=int, default=1)
    p.add_argument("--pretrained_flow_model", type=str, default=None)
    p.add_argument("--pretrained_interp_model", type=str, default=None)
    p.add_argument("--no_emd", action="store_true")
    p.add_argument("--emd_method", type=str, default="auction", choices=["auction", "sinkhorn"])
    p.add_argument("--log_dir", type=str, default="./logs")
    p.add_argument("--use_wandb", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.dataset_name == "kitti":
        dataset = KittiInterpolationDataset(
            args.root, npoints=args.npoints, interval=args.interval,
            train=False, use_intensity=bool(args.use_intensity), seed=args.seed,
        )
    else:
        dataset = NuscenesTripletDataset(
            args.root, args.scenes_list, args.scene_split_lib,
            npoints=args.npoints, interval=args.interval, train=False,
            use_intensity=bool(args.use_intensity), seed=args.seed,
        )

    model = PointINet(freeze_flow=True)
    sample = batch_to_device({k: v[None] for k, v in dataset[0].items()})
    rngs = {"params": jax.random.key(args.seed), "sample": jax.random.key(args.seed + 1)}
    variables = jit_init(
        model, rngs, sample["ini_pc"], sample["end_pc"],
        sample["color"], sample["color"], sample["t"], train=False,
    )
    # the reference composes two checkpoints at load (test.py:42-43)
    if args.pretrained_interp_model:
        variables = load_params(args.pretrained_interp_model, variables)
    if args.pretrained_flow_model:
        variables = load_flow_into(variables, args.pretrained_flow_model)

    @jax.jit
    def fwd(variables, batch, key):
        return model.apply(
            variables, batch["ini_pc"], batch["end_pc"],
            batch["color"], batch["color"], batch["t"],
            train=False, rngs={"sample": key},
        )

    logger = MetricLogger(args.log_dir, use_wandb=args.use_wandb, config=vars(args))
    loader = Loader(dataset, 1, shuffle=False, drop_last=False)
    cds, emds = [], []
    rng = jax.random.key(args.seed)
    for i, batch in enumerate(loader):
        batch = batch_to_device(batch)
        rng, sub = jax.random.split(rng)
        out = fwd(variables, batch, sub)
        cd = float(ops.chamfer_distance(out[..., :3], batch["mid_pc"][..., :3]))
        cds.append(cd)
        rec = {"cd": cd}
        if not args.no_emd:
            emd_fn = ops.sinkhorn_emd if args.emd_method == "sinkhorn" else ops.emd
            e = float(emd_fn(out[..., :3], batch["mid_pc"][..., :3]))
            emds.append(e)
            rec["emd"] = e
        logger.log(rec, step=i)
        print(f"[{i + 1}/{len(loader)}] CD {cd:.6f}"
              + (f"  EMD {rec['emd']:.3f}" if not args.no_emd else ""))
    print(f"Mean CD: {np.mean(cds):.6f}")
    if emds:
        print(f"Mean EMD: {np.mean(emds):.4f}")
    logger.close()


if __name__ == "__main__":
    main()

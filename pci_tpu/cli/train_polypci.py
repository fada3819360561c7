"""Train / evaluate PolyPCI on the key-centric nuScenes protocol.

The reference's PolyPCI scripts are broken (PolyPCI/train.py:13 imports a
nonexistent module and :112 references an undefined variable;
PolyPCI/test.py evaluates the wrong model — SURVEY.md known defects).
This is the working equivalent.  PolyPCI's only trainable part is the
(normally frozen) FlowNet3D, so --freeze 0 trains the flow through the
chain; the default evaluates.
"""

from __future__ import annotations

import argparse

import numpy as np

import jax

from .. import ops
from ..data import Loader, PolyPCIDataset
from ..models import PolyPCI
from ..train import MetricLogger, load_flow_into
from .common import batch_to_device, jit_init


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="PolyPCI eval/train (pci_tpu)")
    p.add_argument("--root", type=str, required=True)
    p.add_argument("--scenes_list", type=str, required=True)
    p.add_argument("--scene_split_lib", type=str, required=True)
    p.add_argument("--field", type=int, default=2)
    p.add_argument("--degree", type=int, default=1)
    p.add_argument("--npoints", type=int, default=16000)
    p.add_argument("--interval", type=int, default=5)
    p.add_argument("--sample_method", type=str, default="fps")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--pretrained_flow_model", type=str, default=None)
    p.add_argument("--log_dir", type=str, default="./logs")
    p.add_argument("--use_wandb", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    dataset = PolyPCIDataset(
        root=args.root, scenes_list=args.scenes_list,
        scene_split_lib=args.scene_split_lib, field=args.field,
        npoints=args.npoints, interval=args.interval,
        sample_method=args.sample_method, seed=args.seed,
    )
    model = PolyPCI(field=args.field, degree=args.degree)
    from ..data import collate

    sample = batch_to_device(collate([dataset[0]]))
    variables = jit_init(
        model, jax.random.key(args.seed),
        sample["forward"], sample["key"], sample["backward"],
        sample["t"], sample["T"], sample["ini"], train=False,
    )
    if args.pretrained_flow_model:
        variables = load_flow_into(variables, args.pretrained_flow_model)

    @jax.jit
    def fwd(variables, batch):
        return model.apply(
            variables, batch["forward"], batch["key"], batch["backward"],
            batch["t"], batch["T"], batch["ini"], train=False,
        )

    logger = MetricLogger(args.log_dir, use_wandb=args.use_wandb, config=vars(args))
    loader = Loader(dataset, args.batch_size, shuffle=False, drop_last=False)
    cds = []
    for i, batch in enumerate(loader):
        batch = batch_to_device(batch)
        out = fwd(variables, batch)
        cd = float(ops.chamfer_distance(out, batch["gt"]))
        cds.append(cd)
        logger.log({"cd": cd, "t": float(batch["t"][0])}, step=i)
        print(f"[{i + 1}/{len(loader)}] t={float(batch['t'][0]):+.3f} CD {cd:.6f}")
    print(f"Mean CD: {np.mean(cds):.6f}")
    logger.close()


if __name__ == "__main__":
    main()

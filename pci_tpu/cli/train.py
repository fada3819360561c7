"""Train ISAPCInet on nuScenes interpolation windows.

Mirror of the reference's top-level train.py (flags train.py:18-48, loop
:91-145): Adam + ClippedStepLR + BN-momentum schedule, chamfer loss,
freeze-flow, best-epoch checkpointing.  Usage:

  python -m pci_tpu.cli.train --root <LIDAR_TOP dir> \
      --scenes_list <train_list.txt> --scene_split_lib <scene-split dir> \
      --field 2 --npoints 16000 --interval 5 --if_random
"""

from __future__ import annotations

import argparse

from ..data import NuscenesInterpolationDataset
from .common import (
    add_common_train_flags,
    add_model_flags,
    add_nuscenes_flags,
    build_isapci,
    example_from_loader,
    run_interp_training,
)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train ISAPCInet / PointINet2 (pci_tpu)")
    p.add_argument("--model", type=str, default="isapci",
                   choices=["isapci", "pointinet2"])
    add_common_train_flags(p)
    add_nuscenes_flags(p)
    add_model_flags(p)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from .common import apply_compute_dtype
    apply_compute_dtype(args)
    dataset = NuscenesInterpolationDataset(
        root=args.root, scenes_list=args.scenes_list,
        scene_split_lib=args.scene_split_lib, field=args.field,
        npoints=args.npoints, interval=args.interval,
        if_random=args.if_random, random_times=args.random_times,
        sample_method=args.sample_method, seed=args.seed,
    )
    example = example_from_loader(dataset)
    if args.model == "pointinet2":
        from .common import build_pointinet2

        model, variables = build_pointinet2(args, example)
    else:
        model, variables = build_isapci(args, example)
    run_interp_training(args, model, variables, dataset)


if __name__ == "__main__":
    main()

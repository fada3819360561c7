"""Batch-save inputs/results/gt as .bin files over a scene.

Mirror of the reference's demo_save_numpy.py:35-81: iterate the
interpolation windows of a scene list, run the model at each window's t,
and dump forward/backward/key/result/gt clouds as float32x3 .bins for
later composition (visualize_demo_file / video generation).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

import jax

from ..data import Loader, NuscenesInterpolationDataset
from .common import add_model_flags, add_nuscenes_flags, batch_to_device, build_isapci, example_from_loader


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Save demo .bins over a scene")
    p.add_argument("--out_dir", type=str, default="./demo_bins")
    p.add_argument("--max_windows", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    add_nuscenes_flags(p)
    add_model_flags(p)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    dataset = NuscenesInterpolationDataset(
        root=args.root, scenes_list=args.scenes_list,
        scene_split_lib=args.scene_split_lib, field=args.field,
        npoints=args.npoints, interval=args.interval,
        if_random=False, sample_method=args.sample_method, seed=args.seed,
    )
    example = example_from_loader(dataset)
    model, variables = build_isapci(args, example)

    @jax.jit
    def fwd(variables, batch, key):
        return model.apply(
            variables, batch["forward"], batch["keys"], batch["backward"],
            batch["t"], batch["ini"], train=False, rngs={"sample": key},
        )

    os.makedirs(args.out_dir, exist_ok=True)
    loader = Loader(dataset, 1, shuffle=False, drop_last=False)
    rng = jax.random.key(args.seed)
    for i, batch in enumerate(loader):
        if i >= args.max_windows:
            break
        batch = batch_to_device(batch)
        rng, sub = jax.random.split(rng)
        out = np.asarray(fwd(variables, batch, sub)[0], np.float32)
        win = os.path.join(args.out_dir, f"window_{i:04d}")
        os.makedirs(win, exist_ok=True)
        out.tofile(os.path.join(win, "result.bin"))
        np.asarray(batch["gt"][0], np.float32).tofile(os.path.join(win, "gt.bin"))
        for j, k in enumerate(batch["keys"]):
            np.asarray(k[0], np.float32).tofile(os.path.join(win, f"key_{j + 1}.bin"))
        for j, f in enumerate(batch["forward"]):
            np.asarray(f[0], np.float32).tofile(os.path.join(win, f"forward_{j + 1}.bin"))
        for j, b in enumerate(batch["backward"]):
            np.asarray(b[0], np.float32).tofile(os.path.join(win, f"backward_{j + 1}.bin"))
        print(f"window {i}: t={float(batch['t'][0]):.3f} -> {win}")


if __name__ == "__main__":
    main()

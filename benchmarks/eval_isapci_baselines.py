"""Identity / oracle CD baselines for the ISAPCInet val protocol.

Walks the same NuscenesInterpolationDataset windows as ``cli.test`` and
reports mean CD(key_i, gt) for both key frames plus the per-window
oracle (best key knowing gt) — the baseline table RESULTS.md publishes
next to each trained checkpoint.

  python -m benchmarks.eval_isapci_baselines [--field 2] [--interval 3]
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root", type=str, default="runs/synth_scenes/lidar")
    p.add_argument("--scenes_list", type=str, default="runs/synth_scenes/val.txt")
    p.add_argument("--scene_split_lib", type=str, default="runs/synth_scenes/split")
    p.add_argument("--field", type=int, default=2)
    p.add_argument("--npoints", type=int, default=16384)
    p.add_argument("--interval", type=int, default=3)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from pci_tpu import ops
    from pci_tpu.data import NuscenesInterpolationDataset

    ds = NuscenesInterpolationDataset(
        root=args.root, scenes_list=args.scenes_list,
        scene_split_lib=args.scene_split_lib, field=args.field,
        npoints=args.npoints, interval=args.interval,
        if_random=False, seed=args.seed,
    )
    cd = jax.jit(lambda a, b: ops.chamfer_distance(a[None], b[None]))
    c1s, c2s, oracles = [], [], []
    for i in range(len(ds)):
        item = ds[i]
        k1 = jnp.asarray(item["keys"][0][:, :3])
        k2 = jnp.asarray(item["keys"][1][:, :3])
        gt = jnp.asarray(item["gt"][:, :3])
        c1, c2 = float(cd(k1, gt)), float(cd(k2, gt))
        c1s.append(c1)
        c2s.append(c2)
        oracles.append(min(c1, c2))
        print(f"[{i + 1}/{len(ds)}] key1 {c1:.6f}  key2 {c2:.6f}", flush=True)
    print(f"Mean CD identity key1: {np.mean(c1s):.6f}")
    print(f"Mean CD identity key2: {np.mean(c2s):.6f}")
    print(f"Mean CD oracle best key: {np.mean(oracles):.6f}")


if __name__ == "__main__":
    main()

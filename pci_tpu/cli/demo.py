"""Render key/result/gt clouds to comparison screenshots.

Mirror of the reference's demo.py:37-98 (and visualize_demo_file.py):
runs the model over a demo window and saves colored composite PNGs.

  python -m pci_tpu.cli.demo --demo_dir <Inputs dir> --out_dir ./shots \
      --field 2 [--pretrained_self_model <ckpt>]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp

from ..data import read_nuscenes_bin, subsample
from ..utils import PcdsVisualizer
from .common import add_model_flags, build_isapci


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Render interpolation demos")
    p.add_argument("--demo_dir", type=str, required=True)
    p.add_argument("--out_dir", type=str, default="./demo_shots")
    p.add_argument("--npoints", type=int, default=16000)
    p.add_argument("--field", type=int, default=0)
    p.add_argument("--t_values", type=float, nargs="+", default=[0.2, 0.4, 0.6, 0.8])
    p.add_argument("--sample_method", type=str, default="fps")
    p.add_argument("--point_size", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    add_model_flags(p)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    rng = np.random.default_rng(args.seed)
    d = args.demo_dir

    def load(fn):
        pts = read_nuscenes_bin(os.path.join(d, fn))[:, :3]
        return jnp.asarray(subsample(pts, args.npoints, args.sample_method, rng))[None]

    keys = [load("key_1.bin"), load("key_2.bin")]
    forward = [load(f"forward_{i}.bin") for i in range(1, args.field + 1)]
    backward = [load(f"backward_{i}.bin") for i in range(1, args.field + 1)]
    ini = jnp.zeros_like(keys[0])
    example = {"forward": forward, "keys": keys, "backward": backward,
               "t": jnp.asarray([0.5], jnp.float32), "ini": ini}
    model, variables = build_isapci(args, example)

    @jax.jit
    def fwd(variables, t, key):
        return model.apply(
            variables, forward, keys, backward, t, ini,
            train=False, rngs={"sample": key},
        )

    os.makedirs(args.out_dir, exist_ok=True)
    for i, t in enumerate(args.t_values):
        result = np.asarray(fwd(variables, jnp.asarray([t], jnp.float32), jax.random.key(i))[0])
        vis = PcdsVisualizer(if_save=True, if_show=False, point_size=args.point_size)
        vis.add_to_vis(np.asarray(keys[0][0]), [0.6, 0.0, 0.4])
        vis.add_to_vis(np.asarray(keys[1][0]), [0.4, 0.0, 0.6])
        vis.add_to_vis(result, [0.0, 1.0, 0.0])
        gt_path = os.path.join(d, f"gt_{t}.bin")
        if os.path.exists(gt_path):
            gt = read_nuscenes_bin(gt_path)[:, :3]
            vis.add_to_vis(subsample(gt, args.npoints, "random", rng), [1.0, 1.0, 1.0])
        shot = os.path.join(args.out_dir, f"demo_t{t}.png")
        vis.show_and_save(shot)
        print(f"t={t}: saved {shot}")


if __name__ == "__main__":
    main()

"""Generate interpolated frames from raw .bin inputs and save them.

Mirror of the reference's demo_generate.py:35-88: load forward/backward/
key scans from a demo directory (the layout of
Demos/20230508test/demo_data/Inputs/), run t in {0.2, 0.4, 0.6, 0.8},
save float32x3 result .bins.

  python -m pci_tpu.cli.demo_generate --demo_dir <Inputs dir> \
      --out_dir ./results --field 0 [--pretrained_self_model <ckpt>]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp

from ..data import read_nuscenes_bin, subsample
from .common import add_model_flags, build_isapci


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Generate interpolated frames")
    p.add_argument("--demo_dir", type=str, required=True)
    p.add_argument("--out_dir", type=str, default="./demo_results")
    p.add_argument("--npoints", type=int, default=16000)
    p.add_argument("--field", type=int, default=0)
    p.add_argument("--t_values", type=float, nargs="+", default=[0.2, 0.4, 0.6, 0.8])
    p.add_argument("--sample_method", type=str, default="fps")
    p.add_argument("--seed", type=int, default=0)
    add_model_flags(p)
    return p.parse_args(argv)


def load_cloud(path, npoints, method, rng):
    pts = read_nuscenes_bin(path)[:, :3]
    return jnp.asarray(subsample(pts, npoints, method, rng))[None]


def main(argv=None):
    args = parse_args(argv)
    rng = np.random.default_rng(args.seed)
    d = args.demo_dir
    load = lambda fn: load_cloud(os.path.join(d, fn), args.npoints, args.sample_method, rng)

    keys = [load("key_1.bin"), load("key_2.bin")]
    forward = [load(f"forward_{i}.bin") for i in range(1, args.field + 1)]
    backward = [load(f"backward_{i}.bin") for i in range(1, args.field + 1)]
    ini = jnp.zeros_like(keys[0])

    example = {
        "forward": forward, "keys": keys, "backward": backward,
        "t": jnp.asarray([0.5], jnp.float32), "ini": ini,
    }
    model, variables = build_isapci(args, example)

    @jax.jit
    def fwd(variables, t, key):
        return model.apply(
            variables, forward, keys, backward, t, ini,
            train=False, rngs={"sample": key},
        )

    os.makedirs(args.out_dir, exist_ok=True)
    for i, t in enumerate(args.t_values):
        out = fwd(variables, jnp.asarray([t], jnp.float32), jax.random.key(i))
        arr = np.asarray(out[0], np.float32)
        path = os.path.join(args.out_dir, f"result_{t}.bin")
        arr.tofile(path)
        print(f"t={t}: saved {arr.shape[0]} pts -> {path}")


if __name__ == "__main__":
    main()

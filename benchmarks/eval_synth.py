"""Held-out evaluation of trained checkpoints (VERDICT round-1 item 3).

Two protocols:

1. --mode val: synthetic held-out scenes (data.synth layout).  For every
   (key1, mid, key2) window: model CD(pred(t), mid) vs the identity
   baselines CD(key1, mid) / CD(key2, mid) / best-key.  Interpolation is
   only real if the model beats the best identity baseline.

2. --mode demo: the reference's committed real nuScenes window
   (/root/reference/Demos/20230508test/demo_data): model prediction at
   t in {0.2, 0.4, 0.6, 0.8} vs gt_<t>.bin, next to (a) the identity
   baselines and (b) the CD of the reference's own committed
   result_field_2/result_<t>.bin outputs — the paper model's actual
   predictions on this window (reference test.py:34-94 protocol).

Usage:
  python -m benchmarks.eval_synth --mode val --ckpt <interp ckpt dir> \
      --root runs/synth_scenes/lidar --scenes_list runs/synth_scenes/val.txt \
      --scene_split_lib runs/synth_scenes/split
  python -m benchmarks.eval_synth --mode demo --ckpt <interp ckpt dir>
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

import jax
import jax.numpy as jnp

DEMO = "/root/reference/Demos/20230508test/demo_data"


def _cd(a, b):
    from pci_tpu import ops

    return float(ops.chamfer_distance(a, b))


def _load_model(ckpt, npoints, seed=0):
    from pci_tpu.models import PointINet
    from pci_tpu.train import load_params

    model = PointINet(freeze_flow=True)
    z = jnp.zeros((1, npoints, 3), jnp.float32)
    rngs = {"params": jax.random.key(seed), "sample": jax.random.key(seed + 1)}
    # jit the init: un-jitted flax init on the TPU tunnel dispatches each
    # op separately (~28 ms each -> minutes); one compiled program is fast
    variables = jax.jit(
        lambda: model.init(rngs, z, z, z, z, jnp.asarray([0.5]), train=False)
    )()
    variables = load_params(ckpt, variables)

    @jax.jit
    def predict(p1, p2, t):
        zeros = jnp.zeros_like(p1)
        return model.apply(
            variables, p1, p2, zeros, zeros, t, train=False,
            rngs={"sample": jax.random.key(7)},
        )

    return predict


def eval_val(args):
    from pci_tpu.data import NuscenesTripletDataset

    ds = NuscenesTripletDataset(
        args.root, args.scenes_list, args.scene_split_lib,
        npoints=args.npoints, interval=args.interval, train=False,
        use_intensity=False, seed=args.seed,
    )
    predict = _load_model(args.ckpt, args.npoints, args.seed)
    rows = []
    for i in range(len(ds)):
        item = ds[i]
        p1 = jnp.asarray(item["ini_pc"][None, :, :3])
        p2 = jnp.asarray(item["end_pc"][None, :, :3])
        gt = jnp.asarray(item["mid_pc"][None, :, :3])
        t = jnp.asarray([item["t"]], jnp.float32)
        pred = predict(p1, p2, t)[..., :3]
        rows.append({
            "t": float(t[0]),
            "cd_model": _cd(pred, gt),
            "cd_key1": _cd(p1, gt),
            "cd_key2": _cd(p2, gt),
        })
        print(f"[{i + 1}/{len(ds)}] t={rows[-1]['t']:.2f} "
              f"model {rows[-1]['cd_model']:.4f} "
              f"key1 {rows[-1]['cd_key1']:.4f} key2 {rows[-1]['cd_key2']:.4f}")
    mean = lambda k: float(np.mean([r[k] for r in rows]))  # noqa: E731
    best_id = float(np.mean([min(r["cd_key1"], r["cd_key2"]) for r in rows]))
    summary = {
        "windows": len(rows),
        "cd_model": mean("cd_model"),
        "cd_identity_key1": mean("cd_key1"),
        "cd_identity_key2": mean("cd_key2"),
        "cd_identity_best": best_id,
        "beats_identity": mean("cd_model") < best_id,
    }
    print(json.dumps(summary))
    return summary


def eval_demo(args):
    from pci_tpu.data import read_nuscenes_bin, read_result_bin, subsample

    rng = np.random.default_rng(args.seed)

    def load5(name, seed):
        pts = read_nuscenes_bin(os.path.join(DEMO, "Inputs", name))[:, :3]
        return jnp.asarray(
            subsample(pts, args.npoints, "random", np.random.default_rng(seed))
        )[None]

    k1, k2 = load5("key_1.bin", 0), load5("key_2.bin", 1)
    predict = _load_model(args.ckpt, args.npoints, args.seed)
    rows = []
    for t in (0.2, 0.4, 0.6, 0.8):
        gt = load5(f"gt_{t}.bin", 2)
        pred = predict(k1, k2, jnp.asarray([t], jnp.float32))[..., :3]
        row = {
            "t": t,
            "cd_model": _cd(pred, gt),
            "cd_key1": _cd(k1, gt),
            "cd_key2": _cd(k2, gt),
        }
        ref_bin = os.path.join(DEMO, "result_field_2", f"result_{t}.bin")
        if os.path.isfile(ref_bin):
            res = read_result_bin(ref_bin)
            res = jnp.asarray(
                subsample(res, args.npoints, "random", rng)
            )[None]
            row["cd_reference_result"] = _cd(res, gt)
        rows.append(row)
        print(json.dumps(row))
    print(json.dumps({"rows": rows}))
    return rows


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["val", "demo"], required=True)
    p.add_argument("--ckpt", type=str, required=True)
    p.add_argument("--root", type=str, default="runs/synth_scenes/lidar")
    p.add_argument("--scenes_list", type=str, default="runs/synth_scenes/val.txt")
    p.add_argument("--scene_split_lib", type=str, default="runs/synth_scenes/split")
    p.add_argument("--npoints", type=int, default=4096)
    p.add_argument("--interval", type=int, default=5)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    if args.mode == "val":
        return eval_val(args)
    return eval_demo(args)


if __name__ == "__main__":
    main()

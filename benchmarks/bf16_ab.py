"""A/B the bf16 activation policy on real TPU hardware: speed + CD.

Loads the trained PointINet checkpoint, evaluates held-out synthetic val
windows under fp32 and bf16 activation policies (same fp32 weights), and
slope-times the forward pass in both.  The bf16 policy is only adopted
(bench.py / serving) if CD drift is within the gate.

Usage:
  python -m benchmarks.bf16_ab [--windows 12] [--npoints 16384]
  python -m benchmarks.bf16_ab --model isapci --field 2   # timing only
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def _slope_time(run, *args, iters=(5, 25)):
    """Honest per-call ms via two scan lengths (cancels tunnel latency)."""
    lo, hi = run(iters[0]), run(iters[1])
    float(lo(*args))
    float(hi(*args))
    t0 = time.perf_counter()
    float(lo(*args))
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(hi(*args))
    t_hi = time.perf_counter() - t0
    return (t_hi - t_lo) / (iters[1] - iters[0]) * 1e3


def _pointinet_predict(variables, model):
    @jax.jit
    def predict(p1, p2, t):
        zeros = jnp.zeros_like(p1)
        return model.apply(
            variables, p1, p2, zeros, zeros, t, train=False,
            rngs={"sample": jax.random.key(7)},
        )

    return predict


def _pointinet_timer(variables, model, p1, p2, t):
    zeros = jnp.zeros_like(p1)

    def make(iters):
        @jax.jit
        def run(variables, p1, p2, t, key):
            def body(carry, i):
                out = model.apply(
                    variables, p1 + carry, p2, zeros, zeros, t,
                    train=False, rngs={"sample": jax.random.fold_in(key, i)},
                )
                return 1e-9 * jnp.sum(out[..., 0]), None

            carry, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(iters))
            return carry

        return lambda *a: run(*a)

    return lambda it: make(it), (variables, p1, p2, t, jax.random.key(3))


def eval_windows(predict, ds, n_windows):
    from pci_tpu import ops

    cds = []
    for i in range(min(n_windows, len(ds))):
        item = ds[i]
        p1 = jnp.asarray(item["ini_pc"][None, :, :3])
        p2 = jnp.asarray(item["end_pc"][None, :, :3])
        gt = jnp.asarray(item["mid_pc"][None, :, :3])
        t = jnp.asarray([item["t"]], jnp.float32)
        pred = predict(p1, p2, t)[..., :3]
        cds.append(float(ops.chamfer_distance(pred, gt)))
    return float(np.mean(cds)), cds


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="pointinet", choices=["pointinet", "isapci"])
    p.add_argument("--field", type=int, default=2)
    p.add_argument("--windows", type=int, default=12)
    p.add_argument("--npoints", type=int, default=16384)
    p.add_argument("--ckpt", default="results/checkpoints/pointinet_synth16k")
    p.add_argument("--skip_eval", action="store_true")
    args = p.parse_args(argv)

    from pci_tpu.nn import policy

    report = {"model": args.model, "npoints": args.npoints}

    if args.model == "isapci":
        # timing-only A/B on ISAPCInet (field=N)
        from pci_tpu.models import ISAPCInet

        rng = np.random.default_rng(0)
        N, field = args.npoints, args.field
        cl = lambda: jnp.asarray(  # noqa: E731
            rng.standard_normal((1, N, 3)).astype(np.float32) * 10
        )
        fwd = [cl() for _ in range(field)]
        keys = [cl(), cl()]
        bwd = [cl() for _ in range(field)]
        t = jnp.asarray([0.4], jnp.float32)
        ini = jnp.zeros((1, N, 3), jnp.float32)

        for name in ("float32", "bfloat16"):
            with policy.compute_dtype_scope(name):
                model = ISAPCInet(field=field)
                rngs = {"params": jax.random.key(0), "sample": jax.random.key(1)}
                variables = jax.jit(
                    lambda: model.init(rngs, fwd, keys, bwd, t, ini, train=False)
                )()

                def make(iters):
                    @jax.jit
                    def run(variables, t, key):
                        def body(carry, i):
                            out = model.apply(
                                variables,
                                [f + carry for f in fwd], keys, bwd, t, ini,
                                train=False,
                                rngs={"sample": jax.random.fold_in(key, i)},
                            )
                            return 1e-9 * jnp.sum(out[..., 0]), None

                        carry, _ = jax.lax.scan(
                            body, jnp.float32(0.0), jnp.arange(iters)
                        )
                        return carry

                    return run

                ms = _slope_time(make, variables, t, jax.random.key(3), iters=(3, 9))
                report[f"isapci_f{field}_ms_{name}"] = round(ms, 2)
                print(json.dumps(report))
        return report

    from pci_tpu.data import NuscenesTripletDataset
    from pci_tpu.models import PointINet
    from pci_tpu.train import load_params

    ds = None
    if not args.skip_eval:
        ds = NuscenesTripletDataset(
            "runs/synth_scenes/lidar", "runs/synth_scenes/val.txt",
            "runs/synth_scenes/split", npoints=args.npoints, interval=5,
            train=False, use_intensity=False, seed=0,
        )

    z = jnp.zeros((1, args.npoints, 3), jnp.float32)
    rng = np.random.default_rng(0)
    pa = jnp.asarray(rng.standard_normal((1, args.npoints, 3)).astype(np.float32) * 10)
    pb = pa + 0.5 * jnp.asarray(
        rng.standard_normal((1, args.npoints, 3)).astype(np.float32)
    )
    tt = jnp.asarray([0.5], jnp.float32)

    for name in ("float32", "bfloat16"):
        with policy.compute_dtype_scope(name):
            model = PointINet(freeze_flow=True)
            rngs = {"params": jax.random.key(0), "sample": jax.random.key(1)}
            variables = jax.jit(
                lambda: model.init(rngs, z, z, z, z, tt, train=False)
            )()
            variables = load_params(args.ckpt, variables)

            if ds is not None:
                predict = _pointinet_predict(variables, model)
                cd, cds = eval_windows(predict, ds, args.windows)
                report[f"cd_val_{name}"] = round(cd, 5)
                print(f"{name}: cd_val={cd:.5f} windows={cds}")

            mk, targs = _pointinet_timer(variables, model, pa, pb, tt)
            ms = _slope_time(mk, *targs, iters=(10, 50))
            report[f"pointinet_ms_{name}"] = round(ms, 3)
            print(json.dumps(report))

    if "cd_val_float32" in report:
        drift = abs(report["cd_val_bfloat16"] - report["cd_val_float32"])
        report["cd_drift_rel"] = round(drift / report["cd_val_float32"], 5)
    print("FINAL", json.dumps(report))
    return report


if __name__ == "__main__":
    main()

"""Train-step timing (VERDICT r3 item 6: last number is r1's 737 ms and
the step has had zero rounds of attention).

Times the full jitted ISAPCInet interp train step (fwd + chamfer + bwd +
Adam + BN update) and its pieces (fwd-only, fwd+loss, value_and_grad) so
the next optimization target is picked from measurement.  Also times the
PointINet fusion-only train step (the reference's stage-2 training,
PointINet20230424/train.py: flow frozen).

  python -m benchmarks.bench_train [--npoints 16384] [--field 2] [--batch 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time_fetch(fn, args, reps, label):
    """Slope timing with value-fetch sync (CLAUDE.md recipe), but for
    BIG steps (>100 ms) a plain loop with per-call fetch is accurate
    enough and avoids double-jitting the heavy backward."""
    import jax

    out = fn(*args)  # compile + warm
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).sum())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).sum())
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label:52s} {dt:8.1f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npoints", type=int, default=16384)
    ap.add_argument("--field", type=int, default=2)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--policy", default="float32",
                    choices=["float32", "bfloat16"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pci_tpu import ops
    from pci_tpu.nn import policy
    from pci_tpu.models import ISAPCInet, PointINet

    policy.set_compute_dtype(args.policy)
    from pci_tpu.train import (
        create_train_state, freeze_params, make_interp_train_step,
        make_optimizer,
    )

    B, N, field = args.batch, args.npoints, args.field
    print(f"device={jax.devices()[0].platform} B={B} N={N} field={field} policy={args.policy}",
          flush=True)
    rng = np.random.default_rng(0)

    def cl(n=N, b=B):
        return jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32) * 10)

    batch = {
        "forward": [cl() for _ in range(field)],
        "keys": [cl(), cl()],
        "backward": [cl() for _ in range(field)],
        "t": jnp.full((B,), 0.4, jnp.float32),
        "gt": cl(),
        "ini": jnp.zeros((B, N, 3), jnp.float32),
    }

    model = ISAPCInet(field=field)
    init_rngs = {"params": jax.random.key(0), "sample": jax.random.key(1)}
    variables = jax.jit(lambda: model.init(
        init_rngs, batch["forward"], batch["keys"], batch["backward"],
        batch["t"], batch["ini"], train=True))()
    optimizer = make_optimizer(1e-3, variables["params"],
                               freeze_subtrees=("flow",))
    state = create_train_state(
        variables["params"], variables["batch_stats"], optimizer)

    key = jax.random.key(3)
    momentum = jnp.asarray(0.5)

    # --- pieces -------------------------------------------------------
    @jax.jit
    def fwd_only(params, bs, key):
        out, _ = model.apply(
            {"params": params, "batch_stats": bs},
            batch["forward"], batch["keys"], batch["backward"],
            batch["t"], batch["ini"], train=True, momentum=momentum,
            rngs={"sample": key}, mutable=["batch_stats"],
        )
        return out

    @jax.jit
    def fwd_loss(params, bs, key):
        params = freeze_params(params, ("flow",))
        out, _ = model.apply(
            {"params": params, "batch_stats": bs},
            batch["forward"], batch["keys"], batch["backward"],
            batch["t"], batch["ini"], train=True, momentum=momentum,
            rngs={"sample": key}, mutable=["batch_stats"],
        )
        return ops.chamfer_distance(out, batch["gt"])

    grad_fn = jax.jit(jax.grad(fwd_loss))

    _time_fetch(fwd_only, (state.params, state.batch_stats, key),
                args.reps, f"ISAPCInet f{field} train fwd only")
    _time_fetch(fwd_loss, (state.params, state.batch_stats, key),
                args.reps, f"ISAPCInet f{field} fwd + chamfer")
    _time_fetch(grad_fn, (state.params, state.batch_stats, key),
                args.reps, f"ISAPCInet f{field} grad (fwd+bwd)")

    step = jax.jit(make_interp_train_step(model, optimizer,
                                          remat=args.remat,
                                          freeze_subtrees=("flow",)))
    _time_fetch(lambda s: step(s, batch, key, momentum)[1]["loss"],
                (state,), args.reps,
                f"ISAPCInet f{field} FULL train step"
                + (" (remat)" if args.remat else ""))

    # --- PointINet stage-2 (fusion-only) train step -------------------
    pmodel = PointINet(freeze_flow=True)
    p1, p2 = cl(), cl()
    zeros = jnp.zeros_like(p1)
    ts = jnp.full((B,), 0.5, jnp.float32)
    pv = jax.jit(lambda: pmodel.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        p1, p2, zeros, zeros, ts, train=True))()
    popt = make_optimizer(1e-3, pv["params"], freeze_subtrees=("flow",))

    @jax.jit
    def pstep(params, bs, key):
        def loss_fn(params):
            params = freeze_params(params, ("flow",))
            out, nv = pmodel.apply(
                {"params": params, "batch_stats": bs}, p1, p2, zeros,
                zeros, ts, train=True, momentum=momentum,
                rngs={"sample": key}, mutable=["batch_stats"],
            )
            return ops.chamfer_distance(out[..., :3], p2), nv
        (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return l

    _time_fetch(pstep, (pv["params"], pv["batch_stats"], key),
                args.reps, "PointINet fusion train fwd+bwd")


if __name__ == "__main__":
    main()

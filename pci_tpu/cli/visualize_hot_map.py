"""Tnet time-weight heatmaps — interpretability tooling.

Mirror of the reference's visualize_hot_map.py:35-74: sweep t over a grid,
collect each Tnet's softmax weights over the 2*field flow candidates,
render a heatmap PNG (weights vs t).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp

from ..nn.heads import Tnet


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Tnet weight heatmap")
    p.add_argument("--field", type=int, default=2)
    p.add_argument("--out_dir", type=str, default="./heatmaps")
    p.add_argument("--steps", type=int, default=21)
    p.add_argument("--pretrained_self_model", type=str, default=None,
                   help="full-model checkpoint; tnet_forward/backward subtrees are used")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    tnet = Tnet(field=args.field)
    t_example = jnp.asarray([[0.5]])
    vars_f = tnet.init(jax.random.key(args.seed), t_example)
    vars_b = tnet.init(jax.random.key(args.seed + 1), t_example)
    if args.pretrained_self_model:
        # pull the tnet subtrees out of a full ISAPCInet checkpoint
        import orbax.checkpoint as ocp

        full = ocp.StandardCheckpointer().restore(
            os.path.abspath(args.pretrained_self_model)
        )
        vars_f = {"params": full["params"]["tnet_forward"]}
        vars_b = {"params": full["params"]["tnet_backward"]}

    ts = np.linspace(0.01, 0.99, args.steps, dtype=np.float32)
    w_f = np.asarray(tnet.apply(vars_f, jnp.asarray(ts)[:, None]))  # [T, 2f]
    w_b = np.asarray(tnet.apply(vars_b, jnp.asarray(ts)[:, None]))

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(args.out_dir, exist_ok=True)
    fig, axes = plt.subplots(1, 2, figsize=(14, 5))
    for ax, w, title in ((axes[0], w_f, "tnet_forward"), (axes[1], w_b, "tnet_backward")):
        im = ax.imshow(
            w.T, aspect="auto", origin="lower", cmap="viridis",
            extent=[ts[0], ts[-1], -0.5, w.shape[1] - 0.5],
        )
        ax.set_xlabel("t")
        ax.set_ylabel("flow candidate")
        ax.set_title(f"{title} (field={args.field})")
        fig.colorbar(im, ax=ax)
    path = os.path.join(args.out_dir, f"field_{args.field}.png")
    fig.savefig(path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    print(f"saved {path}")


if __name__ == "__main__":
    main()

"""CD-vs-t bar / line charts from eval metrics.

Mirror of PolyPCI/Results/V1/draw_bar_chart.py:9-46: the reference
aggregates per-step chamfer into t-bins from wandb CSV exports; here the
input is the framework's own metrics.jsonl (cli.test / cli.train_polypci
write ``{"cd": ..., "t": ...}`` records).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def load_metrics(path: str):
    """(t, cd) series from a metrics.jsonl or a wandb-style CSV export."""
    ts, cds = [], []
    if path.endswith(".csv"):
        import csv

        with open(path) as f:
            for rec in csv.DictReader(f):
                if rec.get("cd") and rec.get("t"):
                    ts.append(float(rec["t"]))
                    cds.append(float(rec["cd"]))
        return np.asarray(ts), np.asarray(cds)
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if "cd" in rec and "t" in rec:
                ts.append(float(rec["t"]))
                cds.append(float(rec["cd"]))
    return np.asarray(ts), np.asarray(cds)


def main(argv=None):
    p = argparse.ArgumentParser(description="CD vs t charts")
    p.add_argument("--metrics", type=str, nargs="+", required=True,
                   help="metrics.jsonl files (one per run/degree/field)")
    p.add_argument("--labels", type=str, nargs="+", default=None)
    p.add_argument("--bins", type=int, default=31)
    p.add_argument("--out", type=str, default="./cd_vs_t.png")
    args = p.parse_args(argv)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    labels = args.labels or [os.path.basename(os.path.dirname(m)) or m
                             for m in args.metrics]
    fig, ax = plt.subplots(figsize=(10, 5))
    for path, label in zip(args.metrics, labels):
        ts, cds = load_metrics(path)
        if len(ts) == 0:
            print(f"{path}: no (cd, t) records, skipping")
            continue
        lo, hi = ts.min(), ts.max()
        edges = np.linspace(lo, hi + 1e-9, args.bins + 1)
        centers = 0.5 * (edges[:-1] + edges[1:])
        means = np.full(args.bins, np.nan)
        for i in range(args.bins):
            m = (ts >= edges[i]) & (ts < edges[i + 1])
            if m.any():
                means[i] = cds[m].mean()
        ax.plot(centers, means, marker="o", ms=3, label=label)
    ax.set_xlabel("t")
    ax.set_ylabel("chamfer distance")
    ax.legend()
    ax.grid(alpha=0.3)
    fig.savefig(args.out, dpi=120, bbox_inches="tight")
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()

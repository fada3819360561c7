"""Experiment tracking.

The reference logs to wandb with a hard-coded API key (train.py:53 — a
defect we do not replicate).  Here: JSONL logging always (greppable,
offline-safe), wandb optionally when installed and requested via
``--use_wandb`` (the PointINet scripts' pattern, train_sceneflow.py:36).
"""

from __future__ import annotations

import json
import os
import time


class MetricLogger:
    def __init__(self, log_dir: str, use_wandb: bool = False, project: str = "pci_tpu", config=None):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._f = open(self.path, "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                wandb.init(project=project, config=config)
                self._wandb = wandb
            except Exception as e:  # wandb missing or offline
                print(f"[metrics] wandb unavailable ({e}); JSONL only")

    def log(self, metrics: dict, step: int | None = None):
        rec = {"time": time.time(), **metrics}
        if step is not None:
            rec["step"] = step
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def close(self):
        self._f.close()
        if self._wandb is not None:
            self._wandb.finish()


def metrics_to_csv(jsonl_path: str, csv_path: str | None = None) -> str:
    """Export a metrics.jsonl to a wandb-style CSV (one column per metric
    key, union over all records; empty cells where a record lacks a key).

    Lets the reference's wandb-CSV plotting workflow
    (PolyPCI/Results/V1/draw_bar_chart.py:9-14) consume this framework's
    logs.  Returns the path written.
    """
    import csv

    records = []
    keys: list[str] = []
    with open(jsonl_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            records.append(rec)
            for k in rec:
                if k not in keys:
                    keys.append(k)
    csv_path = csv_path or os.path.splitext(jsonl_path)[0] + ".csv"
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=keys, restval="")
        w.writeheader()
        w.writerows(records)
    return csv_path

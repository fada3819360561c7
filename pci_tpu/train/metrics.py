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

"""Orbax checkpointing with the reference's compose-and-freeze semantics.

The reference saves ``state_dict`` when epoch loss improves, embedding the
loss in the filename (train.py:140-142), and *composes* checkpoints at
load time: first the pretrained FlowNet3D into ``net.flow``, then
optionally a full model checkpoint on top (train.py:64-66).  Mirrored
here: ``save_best`` keeps loss-stamped step dirs, ``load_flow_into``
grafts a flow-only checkpoint into a full param tree.

Improvement over the reference: optimizer state and step counter are
saved too (the reference loses both on restart, SURVEY.md section 5).
"""

from __future__ import annotations

import os
import re

import orbax.checkpoint as ocp

from .state import TrainState


def _mgr(directory: str) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=3, create=True),
    )


def save_checkpoint(directory: str, state: TrainState, step: int, loss: float | None = None):
    """Save full train state; loss recorded in custom metadata."""
    mgr = _mgr(directory)
    mgr.save(
        step,
        args=ocp.args.StandardSave(state),
        metrics={"loss": float(loss)} if loss is not None else None,
    )
    mgr.wait_until_finished()
    mgr.close()


def load_checkpoint(directory: str, template: TrainState) -> TrainState:
    """Restore the latest checkpoint into a state pytree of matching shape."""
    mgr = _mgr(directory)
    step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {directory}")
    restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    mgr.close()
    return restored


def save_params(directory: str, variables: dict, step: int = 0):
    """Save bare model variables (params + batch_stats) — the analog of the
    reference's ``torch.save(net.state_dict())``."""
    ckptr = ocp.StandardCheckpointer()
    path = os.path.join(os.path.abspath(directory), f"params_{step}")
    ckptr.save(path, variables)
    ckptr.wait_until_finished()
    return path


def load_params(path: str, template: dict) -> dict:
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)


def load_flow_into(variables: dict, flow_ckpt_path: str) -> dict:
    """Graft a FlowNet3D-only checkpoint into a full model's variables
    under the ``flow`` submodule (the reference's
    ``net.flow.load_state_dict`` compose step)."""
    flow_template = {
        "params": variables["params"]["flow"],
        "batch_stats": variables["batch_stats"]["flow"],
    }
    flow_vars = load_params(flow_ckpt_path, flow_template)
    new_params = dict(variables["params"])
    new_params["flow"] = flow_vars["params"]
    new_bs = dict(variables["batch_stats"])
    new_bs["flow"] = flow_vars["batch_stats"]
    return {"params": new_params, "batch_stats": new_bs}


class BestKeeper:
    """Tracks best epoch loss and saves loss-stamped checkpoints, like the
    reference's best-checkpoint-with-loss-in-filename convention."""

    def __init__(self, directory: str, prefix: str = "model"):
        self.directory = directory
        self.prefix = prefix
        self.best = float("inf")

    def update(self, variables: dict, epoch: int, loss: float) -> str | None:
        if loss >= self.best:
            return None
        self.best = loss
        os.makedirs(self.directory, exist_ok=True)
        ckptr = ocp.StandardCheckpointer()
        path = os.path.join(
            os.path.abspath(self.directory), f"{self.prefix}_{loss:.6f}"
        )
        ckptr.save(path, variables, force=True)
        ckptr.wait_until_finished()
        return path

    @staticmethod
    def best_path(directory: str, prefix: str = "model") -> str | None:
        if not os.path.isdir(directory):
            return None
        best, best_loss = None, float("inf")
        for name in os.listdir(directory):
            m = re.fullmatch(rf"{re.escape(prefix)}_([0-9.]+)", name)
            if m:
                loss = float(m.group(1))
                if loss < best_loss:
                    best, best_loss = os.path.join(directory, name), loss
        return best

"""Training loops, schedules, state and checkpointing."""

from .loop import (
    flow_criterion,
    make_interp_eval_step,
    make_interp_train_step,
    make_sceneflow_train_step,
)
from .checkpoints import (
    BestKeeper,
    load_checkpoint,
    load_flow_into,
    load_params,
    save_checkpoint,
    save_params,
)
from .metrics import MetricLogger
from .state import (
    TrainState,
    bn_momentum_schedule,
    clipped_step_lr,
    create_train_state,
    freeze_params,
    make_optimizer,
)

__all__ = [
    "BestKeeper",
    "load_checkpoint",
    "load_flow_into",
    "load_params",
    "save_checkpoint",
    "save_params",
    "MetricLogger",
    "flow_criterion",
    "make_interp_eval_step",
    "make_interp_train_step",
    "make_sceneflow_train_step",
    "TrainState",
    "freeze_params",
    "bn_momentum_schedule",
    "clipped_step_lr",
    "create_train_state",
    "make_optimizer",
]

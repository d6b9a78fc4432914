"""Training subsystem: state, jit step, Orbax checkpoints, driver loop
(SURVEY.md §2 "Trainer", §3.1, §5.4)."""

from bayesod_tpu.train.checkpoint import (
    CheckpointManager,
    load_weights_npz,
    restore_state,
    save_weights_npz,
)
from bayesod_tpu.train.state import (
    TrainState,
    create_train_state,
    make_lr_schedule,
    make_optimizer,
)
from bayesod_tpu.train.step import build_train_step, make_train_model
from bayesod_tpu.train.trainer import train

__all__ = [
    "CheckpointManager",
    "restore_state",
    "save_weights_npz",
    "load_weights_npz",
    "TrainState",
    "build_train_step",
    "make_train_model",
    "create_train_state",
    "make_lr_schedule",
    "make_optimizer",
    "train",
]

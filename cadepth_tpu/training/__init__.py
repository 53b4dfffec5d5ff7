from cadepth_tpu.training.schedule import build_lr_schedule
from cadepth_tpu.training.train_state import (
    TrainState,
    build_optimizer,
    create_train_state,
    make_train_step,
    make_eval_step,
)
from cadepth_tpu.training.checkpoint import CheckpointManager
from cadepth_tpu.training.trainer import Trainer

__all__ = [
    "build_lr_schedule",
    "TrainState",
    "build_optimizer",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "CheckpointManager",
    "Trainer",
]

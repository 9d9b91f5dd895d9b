"""Training subsystem: SPMD trainer, checkpoint policy, state management."""

from .checkpoints import (CheckpointPolicy, load_params_any,
                          restore_checkpoint, save_checkpoint)
from .trainer import (TrainState, Trainer, build_eval_step, build_train_step,
                      make_optimizer)

__all__ = [
    "CheckpointPolicy", "load_params_any", "restore_checkpoint",
    "save_checkpoint", "TrainState", "Trainer", "build_eval_step",
    "build_train_step", "make_optimizer",
]

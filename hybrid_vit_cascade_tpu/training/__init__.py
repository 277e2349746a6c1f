"""L3 training runtime: optax optimizers with stage freezing, Orbax
checkpoints (triple-best + periodic + partial restore), and the jit-compiled
data-parallel train step."""

from .schedules import make_optimizer, stage_freeze_labels
from .checkpoint import CheckpointManager, filtered_restore, shape_matched_transfer
from .trainer import Trainer, TrainState, make_train_step, make_eval_step

__all__ = [
    "make_optimizer",
    "stage_freeze_labels",
    "CheckpointManager",
    "filtered_restore",
    "shape_matched_transfer",
    "Trainer",
    "TrainState",
    "make_train_step",
    "make_eval_step",
]

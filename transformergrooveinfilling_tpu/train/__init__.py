"""Training layer: config system, train state/loop, checkpointing, scheduling."""

from .config import (
    HyperParams,
    derive_model_config,
    load_hyperparameters,
    load_paths,
)
from .schedule import eval_log_freq
from .loop import TrainState, create_train_state, make_train_step, train_epoch
from .driver import ModelBundle, initialize_model, run_training, train_loop
from ..models.losses import calculate_loss
from . import checkpoint

__all__ = [
    "HyperParams",
    "derive_model_config",
    "load_hyperparameters",
    "load_paths",
    "eval_log_freq",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "train_epoch",
    "checkpoint",
    "ModelBundle",
    "initialize_model",
    "run_training",
    "train_loop",
    "calculate_loss",
]

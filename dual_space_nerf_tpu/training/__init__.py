from .checkpoint import Checkpointer, PeriodicCheckpointer
from .loss import make_loss, smooth_l1
from .optim import make_optimizer, reference_schedule
from .state import (
    TrainBatch,
    TrainState,
    create_train_state,
    make_train_step,
    train_batch_shardings,
)

__all__ = [
    "Checkpointer",
    "PeriodicCheckpointer",
    "make_loss",
    "smooth_l1",
    "make_optimizer",
    "reference_schedule",
    "TrainBatch",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "train_batch_shardings",
]

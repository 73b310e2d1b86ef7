from .checkpoint import Checkpointer, PeriodicCheckpointer

# NOTE: .loop is intentionally not imported here — it depends on ..data,
# which imports TrainBatch from this package; import it directly as
# `dual_space_nerf_tpu.training.loop`.
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

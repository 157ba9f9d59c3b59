"""tpu3d.parallel — device mesh, sharding, optimizer, train/eval steps."""

from .mesh import data_sharding, make_mesh, replicate, replicated, shard_batch
from .train_state import (
    TrainState,
    bn_momentum_at_epoch,
    create_train_state,
    make_eval_loss_step,
    make_eval_step,
    make_lr_schedule,
    make_momentum_schedule,
    make_optimizer,
    make_train_step,
)

__all__ = [
    "data_sharding", "make_mesh", "replicate", "replicated", "shard_batch",
    "TrainState", "bn_momentum_at_epoch", "create_train_state", "make_eval_loss_step", "make_eval_step",
    "make_lr_schedule", "make_momentum_schedule", "make_optimizer",
    "make_train_step",
]

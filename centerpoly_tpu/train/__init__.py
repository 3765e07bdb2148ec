from .state import TrainState, create_train_state, lr_schedule
from .step import make_train_step, make_eval_step
from .mesh import (make_mesh, shard_batch, replicate,
                   initialize_distributed)

__all__ = [
    "TrainState",
    "create_train_state",
    "lr_schedule",
    "make_train_step",
    "make_eval_step",
    "make_mesh",
    "shard_batch",
    "replicate",
    "initialize_distributed",
]

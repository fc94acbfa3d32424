from . import distributed, eval, mesh, train
from .mesh import make_mesh, shard_batch, shard_variables
from .train import (
    LossWeights,
    TrainBatch,
    TrainState,
    create_train_state,
    loss_fn,
    synthetic_train_batch,
    train_step,
)

__all__ = [
    "distributed",
    "eval",
    "mesh",
    "train",
    "make_mesh",
    "shard_batch",
    "shard_variables",
    "LossWeights",
    "TrainBatch",
    "TrainState",
    "create_train_state",
    "loss_fn",
    "synthetic_train_batch",
    "train_step",
]

from . import distributed, eval, mesh, train
from .mesh import make_mesh, shard_batch, shard_variables
from .train import (
    LossWeights,
    TemporalTrainBatch,
    TrainBatch,
    TrainState,
    create_train_state,
    loss_fn,
    synthetic_train_batch,
    temporal_loss_fn,
    temporal_train_step,
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
    "TemporalTrainBatch",
    "TrainBatch",
    "TrainState",
    "create_train_state",
    "loss_fn",
    "synthetic_train_batch",
    "temporal_loss_fn",
    "temporal_train_step",
    "train_step",
]

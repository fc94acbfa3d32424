from . import backbone, components, config, convert, ftl, procrustes, umetrack
from .components import RegressorOutput
from .config import ModelConfig
from .umetrack import (
    FrameInputs,
    SkeletonInputs,
    TemporalState,
    UmeTrackNet,
    init_model,
    make_model,
)

__all__ = [
    "backbone",
    "components",
    "config",
    "convert",
    "ftl",
    "procrustes",
    "umetrack",
    "RegressorOutput",
    "ModelConfig",
    "FrameInputs",
    "SkeletonInputs",
    "TemporalState",
    "UmeTrackNet",
    "init_model",
    "make_model",
]

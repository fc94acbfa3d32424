"""Single typed configuration tree for the whole framework.

The reference had three scattered config surfaces — ModelOpts defaults,
HandTrackerOpts, and constants hard-coded in __main__ blocks (SURVEY §5).
Here every subsystem hangs off one dataclass tree that round-trips to JSON,
so runs are reproducible from a single artifact.
"""
from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple

from .models.config import ModelConfig
from .tracker.types import TrackerConfig


@dataclasses.dataclass(frozen=True)
class DataConfig:
    data_roots: Tuple[str, ...] = ()
    fields: Tuple[str, ...] = ("mono", "labels")
    batch_size: int = 16
    crop_size: Tuple[int, int] = (96, 96)
    num_io_threads: int = 6
    max_prefetch: int = 16
    shuffle_seed: int = 0


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    # Tensor-parallel axis size; 1 = pure data parallelism (the measured
    # default — TP loses at this model size, see parallel/mesh.py), 0 = auto
    # (2 when the device count is even).
    model_axis: int = 1
    # process-level sharding for host-local work (video decode)
    rank: int = 0
    world_size: int = 1


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-4
    # "constant" or "cosine" (linear warmup over warmup_steps then cosine
    # decay to ~0 across num_steps)
    lr_schedule: str = "constant"
    warmup_steps: int = 100
    weight_decay: float = 1e-5
    batch_size: int = 32
    num_steps: int = 1000
    log_every: int = 50
    checkpoint_every: int = 500
    checkpoint_dir: Optional[str] = None
    loss_angles: float = 1.0
    loss_wrist_points: float = 1.0
    loss_landmark_nll: float = 0.1
    loss_scale: float = 0.1
    # TBPTT window length (frames); 1 = single-frame training, >1 trains the
    # conv-RNN memory through time.
    tbptt_window: int = 1


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    tracker: TrackerConfig = dataclasses.field(default_factory=TrackerConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)


def _to_jsonable(obj):
    if dataclasses.is_dataclass(obj):
        return {
            f.name: _to_jsonable(getattr(obj, f.name))
            for f in dataclasses.fields(obj)
        }
    if isinstance(obj, (list, tuple)):
        return [_to_jsonable(x) for x in obj]
    return obj


def _from_dict(cls, d):
    kwargs = {}
    hints = {f.name: f for f in dataclasses.fields(cls)}
    for k, v in d.items():
        if k not in hints:
            raise KeyError(f"unknown config key {cls.__name__}.{k}")
        f = hints[k]
        if dataclasses.is_dataclass(f.type) or (
            isinstance(f.type, type) and dataclasses.is_dataclass(f.type)
        ):
            kwargs[k] = _from_dict(f.type, v)
        elif isinstance(v, list):
            kwargs[k] = tuple(
                tuple(x) if isinstance(x, list) else x for x in v
            )
        else:
            kwargs[k] = v
    return cls(**kwargs)


def to_json(config: Config, path: Optional[str] = None) -> str:
    s = json.dumps(_to_jsonable(config), indent=2)
    if path:
        with open(path, "w") as fp:
            fp.write(s)
    return s


def from_json(source: str) -> Config:
    """Parse from a JSON string or a path to a JSON file."""
    if source.lstrip().startswith("{"):
        d = json.loads(source)
    else:
        with open(source) as fp:
            d = json.load(fp)
    # resolve nested dataclass types manually (dataclass fields carry the
    # actual types here)
    return Config(
        model=_from_dict(ModelConfig, d.get("model", {})),
        tracker=_from_dict(TrackerConfig, d.get("tracker", {})),
        data=_from_dict(DataConfig, d.get("data", {})),
        mesh=_from_dict(MeshConfig, d.get("mesh", {})),
        train=_from_dict(TrainConfig, d.get("train", {})),
    )

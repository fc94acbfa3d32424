"""Typed model configuration.

Field-for-field covers the reference ``ModelOpts`` defaults
(/root/reference/lib/models/model_opts.py:10-39), which exactly describe the
published pretrained checkpoint, plus architecture facts that the reference
derives from the ``"resnet_layers_2352-f32"`` arch string
(backbone_resnet.py:169-192).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    # Backbone: stage block counts and base width (arch "resnet_layers_2352-f32")
    backbone_blocks: Tuple[int, ...] = (2, 3, 5, 2)
    backbone_strides: Tuple[int, ...] = (1, 2, 2, 2)
    start_planes: int = 32
    input_size: Tuple[int, int] = (96, 96)

    # Feature channels
    n_image_feature_channels: int = 72
    n_skeleton_feature_channels: int = 4
    n_memory_channels: int = 18

    # Fusion / temporal / regression depth
    n_fusion_blocks: int = 2
    n_temporal_blocks: int = 3
    n_regression_blocks: int = 2

    # FTL
    spatial_ftl_ratio: float = 1.0
    temporal_ftl_ratio: float = 1.0
    use_unscaled_as_canonical: bool = False
    canonical_focal_length: float = 200.0

    # Regressor
    n_wrist_rigid_pts: int = 7
    # Wrist decode: "quat" (Horn power iteration, fast on TPU) or "svd"
    procrustes_method: str = "quat"

    # Dtypes: params live in f32; compute dtype can be bf16 on TPU.
    compute_dtype: str = "float32"

    @property
    def feature_map_size(self) -> Tuple[int, int]:
        # stem pools /2, resnet strides multiply to /8 -> 96/16 = 6
        s = 2
        for st in self.backbone_strides:
            s *= st
        return (self.input_size[0] // s, self.input_size[1] // s)

    @property
    def stage_in_planes(self) -> Tuple[int, ...]:
        p = self.start_planes
        return (p, p, p * 2, p * 4)

    @property
    def stage_out_planes(self) -> Tuple[int, ...]:
        p = self.start_planes
        return (p, p * 2, p * 4, p * 8)

"""ResNet image backbone in Flax (NHWC), sized for 96x96 mono crops.

Architecture parity with the reference backbone
(/root/reference/lib/models/backbone_resnet.py + model_utils.py:107-138):
stem conv(1->32, 3x3) + BN + ReLU + maxpool/2, four BasicBlock stages with
block counts (2, 3, 5, 2), planes 32->(32, 64, 128, 256), strides
(1, 2, 2, 2), then a 1x1 projection to the image-feature channel count.
Layout is NHWC (TPU-native); weight conversion transposes torch's OIHW.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .config import ModelConfig


class BasicBlock(nn.Module):
    """conv3x3-BN-ReLU-conv3x3-BN + residual (with 1x1 downsample) -> ReLU."""

    planes: int
    stride: int = 1
    use_downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=1, use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn1",
        )(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.planes, (3, 3), strides=(1, 1), padding=1,
            use_bias=False, dtype=self.dtype, name="conv2",
        )(y)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn2",
        )(y)
        if self.use_downsample:
            residual = nn.Conv(
                self.planes, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            residual = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="downsample_bn",
            )(residual)
        return nn.relu(y + residual)


class ResNetBackbone(nn.Module):
    """Stem + stages + 1x1 projection; [N, H, W, 1] -> [N, H/16, W/16, C]."""

    config: ModelConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)

        x = nn.Conv(
            cfg.start_planes, (3, 3), padding=1, use_bias=True,
            dtype=dtype, name="stem_conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=dtype, name="stem_bn",
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))

        in_planes = cfg.stage_in_planes
        out_planes = cfg.stage_out_planes
        for si, (n_blocks, stride) in enumerate(
            zip(cfg.backbone_blocks, cfg.backbone_strides)
        ):
            planes = out_planes[si]
            for bi in range(n_blocks):
                first = bi == 0
                x = BasicBlock(
                    planes=planes,
                    stride=stride if first else 1,
                    use_downsample=first and (stride != 1 or in_planes[si] != planes),
                    dtype=dtype,
                    name=f"stage{si}_block{bi}",
                )(x, train=train)

        x = nn.Conv(
            cfg.n_image_feature_channels, (1, 1), use_bias=True,
            dtype=dtype, name="proj_conv",
        )(x)
        return x

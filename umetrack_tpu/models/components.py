"""Model sub-components: multi-view fusion, temporal conv-RNN cell,
skeleton encoder and pose-regression head (Flax, NHWC).

Architecture parity with the reference modules:
- fusion ladder: model_utils.py:141-163
- temporal 1x1-conv stack: temporal.py:16-91
- skeleton encoder: skeleton_encoder.py:28-53
- regressor head + decoders: regressor.py:19-186, model_utils.py:195-208
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax import struct

from .backbone import BasicBlock
from .config import ModelConfig
from .procrustes import procrustes_align


class MultiViewFusion(nn.Module):
    """1x1-conv ladder linearly stepping channels nc_in -> nc_out, then one
    extra 1x1 conv so features aren't all-positive after the final ReLU."""

    nc_in: int
    nc_out: int
    n_blocks: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        channels = np.linspace(self.nc_in, self.nc_out, self.n_blocks + 1)
        for i in range(self.n_blocks):
            x = nn.Conv(
                int(channels[i + 1]), (1, 1), dtype=self.dtype, name=f"conv{i}"
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name=f"bn{i}",
            )(x)
            x = nn.relu(x)
        x = nn.Conv(self.nc_out, (1, 1), dtype=self.dtype, name="conv_out")(x)
        return x


class TemporalConvStack(nn.Module):
    """The conv-RNN cell body: n 1x1 convs at constant width, ReLU between
    (not after the last).  Input = concat([memory, image features])."""

    n_channels: int
    n_blocks: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_blocks):
            x = nn.Conv(
                self.n_channels, (1, 1), dtype=self.dtype, name=f"conv{i}"
            )(x)
            if i != self.n_blocks - 1:
                x = nn.relu(x)
        return x


class SkeletonEncoder(nn.Module):
    """22 joints x (axis 3 + rest position 3) = 132 -> Linear -> feature map.

    The Linear output is viewed as (C, H, W) in the reference's NCHW layout;
    we reshape identically then transpose to NHWC so converted torch weights
    produce bit-identical features.
    """

    out_channels: int
    feature_map_size: Tuple[int, int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, joint_rotation_axes, joint_rest_positions, train: bool = False):
        b = joint_rotation_axes.shape[0]
        feats = jnp.concatenate(
            [joint_rotation_axes, joint_rest_positions], axis=-1
        ).reshape(b, -1)
        h, w = self.feature_map_size
        x = nn.Dense(
            self.out_channels * h * w, dtype=self.dtype, name="linear"
        )(feats)
        x = x.reshape(b, self.out_channels, h, w).transpose(0, 2, 3, 1)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn",
        )(x)
        return nn.relu(x)


def gen_rigid_points(n_points: int = 7, dtype=np.float32) -> np.ndarray:
    """Canonical wrist rigid sample points, norm 0.1 (regressor.py:19-47)."""
    pts = np.array(
        [
            [0, 0, 0],
            [1, 0, 0],
            [0, 1, 0],
            [0, 0, 1],
            [-1, -1, 0],
            [-1, 0, -1],
            [0, -1, -1],
        ],
        dtype=np.float64,
    )
    norms = np.linalg.norm(pts, axis=-1, keepdims=True)
    scaled = np.where(norms == 0, pts, pts / np.maximum(norms, 1e-12) * 0.1)
    assert n_points <= len(pts)
    return scaled[:n_points].astype(dtype)


def output_layout(n_wrist_rigid_pts: int, predict_skel_scale: bool):
    """Output vector layout: {name: (start, stop)} and total dim
    (regressor.py:50-73)."""
    dims = {
        "joint_angles": 20,
        "wrist_xfs": n_wrist_rigid_pts * 3,
        "skel_scales": 1 if predict_skel_scale else 0,
        "landmark_uncertainty_sigmas": 21,
    }
    ranges: Dict[str, Tuple[int, int]] = {}
    n = 0
    for k, v in dims.items():
        if v:
            ranges[k] = (n, n + v)
            n += v
    return ranges, n


@struct.dataclass
class RegressorOutput:
    joint_angles: jnp.ndarray  # [B, 22]
    wrist_xfs: jnp.ndarray  # [B, 4, 4]
    landmark_uncertainty_sigmas: jnp.ndarray  # [B, 21]
    skel_scales: Optional[jnp.ndarray] = None  # [B]
    # Raw predicted rigid points (before the SVD decode), kept for training:
    # supervising these avoids differentiating through the SVD.
    wrist_points: Optional[jnp.ndarray] = None  # [B, n_rigid_pts, 3]


class PoseRegressor(nn.Module):
    """n BasicBlocks + 1x1 conv to output dims + global average pool, then
    per-range decoders (angles, SVD wrist, exp scale, softplus sigmas)."""

    config: ModelConfig
    predict_skel_scale: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> RegressorOutput:
        cfg = self.config
        ranges, n_out = output_layout(cfg.n_wrist_rigid_pts, self.predict_skel_scale)
        n_in = x.shape[-1]
        for i in range(cfg.n_regression_blocks):
            x = BasicBlock(
                planes=n_in, stride=1, use_downsample=False,
                dtype=self.dtype, name=f"block{i}",
            )(x, train=train)
        x = nn.Conv(n_out, (1, 1), dtype=self.dtype, name="conv_out")(x)
        # Decode in f32 regardless of compute dtype: the Procrustes/exp/
        # softplus decodes are precision-sensitive while the conv stack
        # tolerates bf16.
        pose_features = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)

        b = pose_features.shape[0]
        r0, r1 = ranges["joint_angles"]
        finger_angles = pose_features[:, r0:r1]
        joint_angles = jnp.concatenate(
            [finger_angles, jnp.zeros((b, 2), dtype=pose_features.dtype)], axis=-1
        )

        r0, r1 = ranges["wrist_xfs"]
        pred_pts = pose_features[:, r0:r1].reshape(b, -1, 3)
        rigid_src = jnp.asarray(
            gen_rigid_points(cfg.n_wrist_rigid_pts), dtype=pose_features.dtype
        )
        from_pts = jnp.broadcast_to(rigid_src, (b, *rigid_src.shape))
        wrist_xfs = procrustes_align(from_pts, pred_pts, cfg.procrustes_method)

        skel_scales = None
        if self.predict_skel_scale:
            r0, r1 = ranges["skel_scales"]
            skel_scales = jnp.exp(pose_features[:, r0])

        r0, r1 = ranges["landmark_uncertainty_sigmas"]
        sigmas = jnp.maximum(nn.softplus(pose_features[:, r0:r1]), 1e-5)

        return RegressorOutput(
            joint_angles=joint_angles,
            wrist_xfs=wrist_xfs,
            landmark_uncertainty_sigmas=sigmas,
            skel_scales=skel_scales,
            wrist_points=pred_pts,
        )

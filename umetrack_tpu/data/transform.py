"""torch_data preprocessing: msgpack labels -> device-ready model sequences.

Counterpart of the reference ``lib/batched_dataset/`` (sample.py:16-53,
data_transform.py:57-397), redesigned TPU-first: instead of 6 fork-worker
processes doing per-frame numpy crops, the loader only parses bytes, and the
whole crop+resample chain (per-frame crop cameras from enclosing points,
pixel homographies, batched bilinear warp, mm->m unit conversion) runs
vmapped inside jit — on device, fusable with the eval/train step.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..geometry import affine
from ..geometry.crop import gen_crop_camera_from_points
from ..kinematics.hand import HandModel, from_dict, mirrored_hand_model, scaled_hand_model
from ..ops.resample import resample_images

MM_TO_M = 0.001


@struct.dataclass
class RawSequence:
    """One parsed torch_data sequence (units: mm, as stored)."""

    images: jnp.ndarray  # [T, V, H, W]
    extrinsics: jnp.ndarray  # [T, V, 4, 4] world->eye
    intrinsics: jnp.ndarray  # [T, V, 3, 3]
    enclosing_points: jnp.ndarray  # [T, P, 3]
    hand: jnp.ndarray  # [T] hand index
    hand_model: HandModel  # GT user skeleton (unbatched)
    wrist: jnp.ndarray  # [T, 4, 4]
    joint_angles: jnp.ndarray  # [T, 22]
    solved_wrist_xfs: jnp.ndarray  # [T, 4, 4]
    solved_joint_angles: jnp.ndarray  # [T, 22]
    generic_hand_model: HandModel
    pinch: jnp.ndarray  # [T]


@struct.dataclass
class PoseData:
    joint_angles: jnp.ndarray  # [T, 22]
    wrist_xfs: jnp.ndarray  # [T, 4, 4] (meters)
    left_hand_model: HandModel  # left-mirrored, meters (unbatched)


@struct.dataclass
class ModelInput:
    orig_pose_data: PoseData
    s_solved_pose_data: PoseData
    left_images: jnp.ndarray  # [T, V, h, w] in [0, 1]
    intrinsics: jnp.ndarray  # [T, V, 3, 3]
    extrinsics_xf: jnp.ndarray  # [T, V, 4, 4] world->eye, meters
    hand_idx: jnp.ndarray  # [T]


@struct.dataclass
class ModelTarget:
    gt_joint_angles: jnp.ndarray
    gt_wrist_xfs: jnp.ndarray
    gt_scale: Optional[jnp.ndarray]
    solved_joint_angles: jnp.ndarray
    solved_wrist_xfs: jnp.ndarray
    solved_scale: Optional[jnp.ndarray]
    pinch: jnp.ndarray


def parse_raw_buffers(mono: np.ndarray, labels: Dict[str, Any]) -> RawSequence:
    """msgpack label dict + mono tensor -> typed RawSequence
    (reference sample.py:42-53 schema).

    Host-side only: every leaf is a numpy array, so the parse can run inside
    prefetch worker threads with no device round-trip; the single upload
    happens at the jitted consumer's argument transfer."""
    def np32(v):
        return np.asarray(v, np.float32)

    fields: Dict[str, Any] = {"images": np.asarray(mono)}
    for key, value in labels.items():
        if "hand_model" in key:
            fields[key] = from_dict(value, np_arrays=True)
        else:
            fields[key] = np32(value)
    return RawSequence(
        images=fields["images"],
        extrinsics=fields["extrinsics"],
        intrinsics=fields["intrinsics"],
        enclosing_points=fields["enclosing_points"],
        hand=fields["hand"],
        hand_model=fields["hand_model"],
        wrist=fields["wrist"],
        joint_angles=fields["joint_angles"],
        solved_wrist_xfs=fields["solved_wrist_xfs"],
        solved_joint_angles=fields["solved_joint_angles"],
        generic_hand_model=fields["generic_hand_model"],
        pinch=fields["pinch"],
    )


def _pinhole_k44(intr: jnp.ndarray) -> jnp.ndarray:
    """Embed a 3x3 pinhole K into 4x4 (data_transform.py:65-69)."""
    out = jnp.zeros((*intr.shape[:-2], 4, 4), intr.dtype)
    out = out.at[..., :3, :3].set(intr)
    out = out.at[..., 3, 3].set(1.0)
    return out


def _pinhole_k44_inv(intr: jnp.ndarray) -> jnp.ndarray:
    fx = intr[..., 0, 0]
    fy = intr[..., 1, 1]
    cx = intr[..., 0, 2]
    cy = intr[..., 1, 2]
    z = jnp.zeros_like(fx)
    o = jnp.ones_like(fx)
    rows = [
        jnp.stack([1.0 / fx, z, -cx / fx, z], axis=-1),
        jnp.stack([z, 1.0 / fy, -cy / fy, z], axis=-1),
        jnp.stack([z, z, o, z], axis=-1),
        jnp.stack([z, z, z, o], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def preprocess_sequence(
    raw: RawSequence,
    crop_size: Tuple[int, int] = (96, 96),
    focal_multiplier: float = 0.95,
) -> Tuple[ModelInput, ModelTarget]:
    """Full device-side preprocess (reference preprocess,
    data_transform.py:284-397): mm->m, left-mirror hand models, per-frame
    crop cameras from enclosing points, batched homography resample."""
    t, v = raw.images.shape[:2]

    # mm -> meters (data_transform.py:306, sample.py:33-39)
    extr = raw.extrinsics.at[..., :3, 3].multiply(MM_TO_M)
    enclosing = raw.enclosing_points * MM_TO_M
    wrist = raw.wrist.at[..., :3, 3].multiply(MM_TO_M)
    solved_wrist = raw.solved_wrist_xfs.at[..., :3, 3].multiply(MM_TO_M)
    hand_model_m = scaled_hand_model(raw.hand_model, MM_TO_M)
    generic_m = scaled_hand_model(raw.generic_hand_model, MM_TO_M)

    is_right = raw.hand[0] == 1
    left_hand_model = mirrored_hand_model(hand_model_m, is_right)
    left_generic = mirrored_hand_model(generic_m, is_right)

    # Per-(frame, view) crop cameras from the frame's enclosing points.
    def crop_one(extr_tv, pts_t):
        return gen_crop_camera_from_points(
            affine.rigid_inverse(extr_tv),
            pts_t,
            crop_size,
            mirror_img_x=is_right,
            camera_angle_deg=0.0,
            focal_multiplier=focal_multiplier,
        )

    crops = jax.vmap(
        lambda extr_t, pts_t: jax.vmap(lambda e: crop_one(e, pts_t))(extr_t)
    )(extr, enclosing)  # leaves [T, V, ...]

    new_w2e = affine.rigid_inverse(crops.T_world_from_eye)
    new_k = crops.intrinsics_matrix()

    # dst-pixel -> src-pixel homography (data_transform.py:57-75):
    # K_orig @ world_to_eye_orig @ eye_to_world_new @ K_new^-1
    resample_xf = (
        _pinhole_k44(raw.intrinsics)
        @ extr
        @ crops.T_world_from_eye
        @ _pinhole_k44_inv(new_k)
    )

    warped = resample_images(
        raw.images.reshape(t * v, *raw.images.shape[2:]).astype(jnp.float32),
        resample_xf.reshape(t * v, 4, 4),
        crop_size,
    ).reshape(t, v, *crop_size)
    left_images = warped / 255.0

    model_input = ModelInput(
        orig_pose_data=PoseData(
            joint_angles=raw.joint_angles,
            wrist_xfs=wrist,
            left_hand_model=left_hand_model,
        ),
        s_solved_pose_data=PoseData(
            joint_angles=raw.solved_joint_angles,
            wrist_xfs=solved_wrist,
            left_hand_model=left_generic,
        ),
        left_images=left_images,
        intrinsics=new_k,
        extrinsics_xf=new_w2e,
        hand_idx=raw.hand,
    )
    target = ModelTarget(
        gt_joint_angles=raw.joint_angles,
        gt_wrist_xfs=wrist,
        gt_scale=left_hand_model.hand_scale,
        solved_joint_angles=raw.solved_joint_angles,
        solved_wrist_xfs=solved_wrist,
        solved_scale=left_generic.hand_scale,
        pinch=raw.pinch,
    )
    return model_input, target


def preprocess(
    data: Dict[str, Any], crop_size: Tuple[int, int] = (96, 96)
) -> Tuple[ModelInput, ModelTarget]:
    """Loader-facing entry: {"mono": ndarray, "labels": msgpack dict}."""
    raw = parse_raw_buffers(data["mono"], data["labels"])
    return preprocess_sequence(raw, crop_size)

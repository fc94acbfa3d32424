"""Hand model: 22-DoF kinematic skeleton, 21 landmarks, 17 skinning frames.

TPU-native counterpart of the reference ``lib/common/hand.py`` — the model is
a registered pytree of jnp arrays (usable under jit/vmap/scan/shard), and the
mirror/scale utilities are pure functions with mask-based (not boolean-index)
updates so they stay shape-static.  Constants match hand.py:12-21.
"""
from __future__ import annotations

import json
from enum import Enum
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

NUM_HANDS = 2
NUM_LANDMARKS_PER_HAND = 21
NUM_FINGERTIPS_PER_HAND = 5
NUM_JOINTS_PER_HAND = 22
LEFT_HAND_INDEX = 0
RIGHT_HAND_INDEX = 1

NUM_DIGITS = 5
NUM_JOINT_FRAMES = 1 + 1 + 3 * 5  # root + wrist + 3 frames per digit
DOF_PER_FINGER = 4


class Landmark(Enum):
    THUMB_FINGERTIP = 0
    INDEX_FINGER_FINGERTIP = 1
    MIDDLE_FINGER_FINGERTIP = 2
    RING_FINGER_FINGERTIP = 3
    PINKY_FINGER_FINGERTIP = 4
    WRIST_JOINT = 5
    THUMB_INTERMEDIATE_FRAME = 6
    THUMB_DISTAL_FRAME = 7
    INDEX_PROXIMAL_FRAME = 8
    INDEX_INTERMEDIATE_FRAME = 9
    INDEX_DISTAL_FRAME = 10
    MIDDLE_PROXIMAL_FRAME = 11
    MIDDLE_INTERMEDIATE_FRAME = 12
    MIDDLE_DISTAL_FRAME = 13
    RING_PROXIMAL_FRAME = 14
    RING_INTERMEDIATE_FRAME = 15
    RING_DISTAL_FRAME = 16
    PINKY_PROXIMAL_FRAME = 17
    PINKY_INTERMEDIATE_FRAME = 18
    PINKY_DISTAL_FRAME = 19
    PALM_CENTER = 20


@struct.dataclass
class HandModel:
    """Pytree hand model; all fields may carry arbitrary leading batch dims."""

    joint_rotation_axes: jnp.ndarray  # [..., 22, 3]
    joint_rest_positions: jnp.ndarray  # [..., 22, 3]
    landmark_rest_positions: jnp.ndarray  # [..., 21, 3]
    landmark_rest_bone_weights: jnp.ndarray  # [..., 21, K]
    landmark_rest_bone_indices: jnp.ndarray  # [..., 21, K] int
    hand_scale: Optional[jnp.ndarray] = None  # [...]
    joint_limits: Optional[jnp.ndarray] = None  # [..., 22, 2]
    # Topology / mesh fields kept for API completeness with the reference
    # HandModel NamedTuple (hand.py:48-62); unused by inference math.
    joint_frame_index: Optional[jnp.ndarray] = None  # [..., 22]
    joint_parent: Optional[jnp.ndarray] = None
    joint_first_child: Optional[jnp.ndarray] = None
    joint_next_sibling: Optional[jnp.ndarray] = None
    mesh_vertices: Optional[jnp.ndarray] = None
    mesh_triangles: Optional[jnp.ndarray] = None
    dense_bone_weights: Optional[jnp.ndarray] = None


def from_dict(
    d: Dict[str, Any], dtype=jnp.float32, np_arrays: bool = False
) -> HandModel:
    """Build a HandModel from the JSON/msgpack dict schema used by the
    reference datasets (video_pose_data.py:63-72, sample.py:42-53).

    ``np_arrays=True`` keeps leaves as host numpy arrays — used by data
    loaders running in prefetch worker threads, so parsing never triggers a
    device transfer (the upload happens once, at the jitted consumer)."""
    def arr(key, as_int=False):
        if key not in d or d[key] is None:
            return None
        a = np.asarray(d[key])
        if np_arrays:
            return a.astype(np.int32 if as_int else np.dtype(dtype))
        return jnp.asarray(a, dtype=jnp.int32 if as_int else dtype)

    return HandModel(
        joint_rotation_axes=arr("joint_rotation_axes"),
        joint_rest_positions=arr("joint_rest_positions"),
        landmark_rest_positions=arr("landmark_rest_positions"),
        landmark_rest_bone_weights=arr("landmark_rest_bone_weights"),
        landmark_rest_bone_indices=arr("landmark_rest_bone_indices", as_int=True),
        hand_scale=arr("hand_scale"),
        joint_limits=arr("joint_limits"),
        joint_frame_index=arr("joint_frame_index", as_int=True),
        joint_parent=arr("joint_parent", as_int=True),
        joint_first_child=arr("joint_first_child", as_int=True),
        joint_next_sibling=arr("joint_next_sibling", as_int=True),
        mesh_vertices=arr("mesh_vertices"),
        mesh_triangles=arr("mesh_triangles", as_int=True),
        dense_bone_weights=arr("dense_bone_weights"),
    )


def load_hand_model_json(path: str) -> HandModel:
    with open(path, "r") as fp:
        return from_dict(json.load(fp))


def scaled_hand_model(hand: HandModel, multiplier) -> HandModel:
    """Uniformly scale rest geometry (reference hand.py:65-98)."""
    m = jnp.asarray(multiplier, dtype=hand.joint_rest_positions.dtype)
    mm = m[..., None, None]
    return hand.replace(
        joint_rest_positions=hand.joint_rest_positions * mm,
        landmark_rest_positions=hand.landmark_rest_positions * mm,
        mesh_vertices=None
        if hand.mesh_vertices is None
        else hand.mesh_vertices * mm,
    )


def mirrored_hand_model(hand: HandModel, to_mirror: jnp.ndarray) -> HandModel:
    """Mirror right hands into left-hand canonical space.

    ``to_mirror`` is a boolean mask over the leading batch dims; where true,
    rotation-axis y/z components and rest-position x components are negated
    (reference hand.py:101-134).  Mask-based select, shape-static.
    """
    m = jnp.asarray(to_mirror)[..., None, None]

    def flip_axes(a):
        sign = jnp.asarray([1.0, -1.0, -1.0], dtype=a.dtype)
        return jnp.where(m, a * sign, a)

    def flip_x(a):
        sign = jnp.asarray([-1.0, 1.0, 1.0], dtype=a.dtype)
        return jnp.where(m, a * sign, a)

    return hand.replace(
        joint_rotation_axes=flip_axes(hand.joint_rotation_axes),
        joint_rest_positions=flip_x(hand.joint_rest_positions),
        landmark_rest_positions=flip_x(hand.landmark_rest_positions),
    )


def neutral_joint_angles(hand: HandModel, lower_factor: float = 0.5) -> jnp.ndarray:
    """Mid-joint-limit pose used for crop-point generation
    (reference perspective_crop.py:19-24)."""
    lim = hand.joint_limits
    return lim[..., 0] * lower_factor + lim[..., 1] * (1.0 - lower_factor)

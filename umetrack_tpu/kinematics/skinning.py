"""Forward kinematics + linear-blend skinning in pure jnp.

Functional redesign of the reference ``lib/common/hand_skinning.py``:
- axis-angle exponentials use the closed-form Rodrigues map
  (replacing pytorch3d ``so3_exp_map``, hand_skinning.py:12,46)
- the 5x4-joint finger chains are unrolled statically (tiny, fuses well)
- scatter-based skinning weights become a one-hot matmul
- arbitrary leading batch dims via vmap over a single-sample core

Frame layout (hand_skinning.py:100-127): 17 frames = [root, wrist,
digit0_frame1..3, ..., digit4_frame1..3] where each digit contributes the
transforms after applying 2, 3 and 4 of its joints.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry import affine
from .hand import DOF_PER_FINGER, NUM_DIGITS, NUM_JOINT_FRAMES, HandModel


def _joint_local_transforms(
    rotation_axes: jnp.ndarray,  # [J, 3]
    rest_positions: jnp.ndarray,  # [J, 3]
    joint_angles: jnp.ndarray,  # [J]
) -> jnp.ndarray:  # [J, 4, 4]
    """Rotation about each joint's axis, pivoting at its rest position."""
    aa = rotation_axes * joint_angles[..., None]
    rot = affine.rodrigues(aa)  # [J, 3, 3]
    trans = rest_positions - jnp.einsum("jab,jb->ja", rot, rest_positions)
    out = jnp.zeros((*rot.shape[:-2], 4, 4), dtype=rot.dtype)
    out = out.at[..., :3, :3].set(rot)
    out = out.at[..., :3, 3].set(trans)
    out = out.at[..., 3, 3].set(1.0)
    return out


def hand_skinning_transforms(
    rotation_axes: jnp.ndarray,  # [22 or 20, 3]
    rest_positions: jnp.ndarray,  # [22 or 20, 3]
    joint_angles: jnp.ndarray,  # [22 or 20]
    wrist_transform: jnp.ndarray,  # [4, 4]
) -> jnp.ndarray:  # [17, 4, 4]
    """Single-sample FK producing the 17 skinning frames.

    The five digit chains are independent, so the chain runs as
    ``DOF_PER_FINGER`` batched [5, 4, 4] matmuls (digit-parallel) instead of
    5x4 sequential scalar ones — on TPU the op COUNT, not the FLOPs, is what
    crop generation pays for (each tiny dispatched op costs ~HBM latency;
    round-5 crop-gen shrink, VERDICT r4 item 5)."""
    local = _joint_local_transforms(
        rotation_axes[:20], rest_positions[:20], joint_angles[:20]
    ).reshape(NUM_DIGITS, DOF_PER_FINGER, 4, 4)
    chain = []
    m = jnp.broadcast_to(wrist_transform, (NUM_DIGITS, 4, 4))
    for j in range(DOF_PER_FINGER):
        m = m @ local[:, j]
        chain.append(m)
    # keep frames after joints 2, 3, 4 of each digit, digit-major
    digits = jnp.stack(chain[1:], axis=1).reshape(
        NUM_DIGITS * (DOF_PER_FINGER - 1), 4, 4
    )
    root = jnp.broadcast_to(wrist_transform, (2, 4, 4))  # root + wrist
    return jnp.concatenate([root, digits], axis=0)


def skinning_weight_matrix(
    bone_indices: jnp.ndarray,  # [V, K] int
    bone_weights: jnp.ndarray,  # [V, K]
    n_frames: int = NUM_JOINT_FRAMES,
) -> jnp.ndarray:  # [V, n_frames]
    """Sparse (index, weight) pairs -> dense per-frame weights.

    One-hot weighted sum replaces the flat scatter of the reference
    (hand_skinning.py:70-97); zero weights contribute nothing regardless of
    their (possibly garbage) indices.
    """
    onehot = jax.nn.one_hot(bone_indices, n_frames, dtype=bone_weights.dtype)
    return jnp.einsum("vk,vkf->vf", bone_weights, onehot)


def _skin_points_single(
    frames: jnp.ndarray,  # [17, 4, 4]
    weights: jnp.ndarray,  # [V, 17]
    points: jnp.ndarray,  # [V, 3]
) -> jnp.ndarray:  # [V, 3]
    """LBS: blend the frame transforms per point, then apply."""
    blended = jnp.einsum("vf,fab->vab", weights, frames)  # [V, 4, 4]
    return (
        jnp.einsum("vab,vb->va", blended[..., :3, :3], points)
        + blended[..., :3, 3]
    )


def _skin_landmarks_single(
    hand: HandModel, joint_angles: jnp.ndarray, wrist_transform: jnp.ndarray
) -> jnp.ndarray:
    frames = hand_skinning_transforms(
        hand.joint_rotation_axes, hand.joint_rest_positions, joint_angles,
        wrist_transform,
    )
    weights = skinning_weight_matrix(
        hand.landmark_rest_bone_indices, hand.landmark_rest_bone_weights
    )
    return _skin_points_single(frames, weights, hand.landmark_rest_positions)


def skin_landmarks(
    hand: HandModel,
    joint_angles: jnp.ndarray,  # [..., 22]
    wrist_transforms: jnp.ndarray,  # [..., 4, 4]
) -> jnp.ndarray:  # [..., 21, 3]
    """Landmark positions for arbitrary leading batch dims.

    The hand model may be unbatched (shared) or batched to match the pose's
    leading dims, mirroring the reference contract (hand_skinning.py:162-170).
    """
    batch_shape = joint_angles.shape[:-1]
    if batch_shape == ():
        return _skin_landmarks_single(hand, joint_angles, wrist_transforms)

    n = 1
    for s in batch_shape:
        n *= s
    angles_flat = joint_angles.reshape(n, joint_angles.shape[-1])
    wrist_flat = wrist_transforms.reshape(n, 4, 4)

    hand_batched = hand.joint_rotation_axes.ndim > 2
    if hand_batched:
        hand_flat = jax.tree_util.tree_map(
            lambda a: None
            if a is None
            else a.reshape(n, *a.shape[len(batch_shape):]),
            hand,
        )
        out = jax.vmap(_skin_landmarks_single)(hand_flat, angles_flat, wrist_flat)
    else:
        out = jax.vmap(lambda a, w: _skin_landmarks_single(hand, a, w))(
            angles_flat, wrist_flat
        )
    return out.reshape(*batch_shape, *out.shape[-2:])

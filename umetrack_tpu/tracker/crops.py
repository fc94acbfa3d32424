"""Crop-camera generation from GT poses — fully on-device, mask-based.

Reimplements the reference's ``gen_crop_cameras_from_pose`` chain
(perspective_crop.py:89-162 + tracker.py:101-139) with static shapes:

- 63 crop points = landmarks of the GT pose + neutral (mid-limit) pose +
  open (zero) pose
- per-camera visibility count over the 21 GT landmarks; a camera is
  eligible when >= min_required_vis_landmarks are in view
- with ``sort_camera_index=True`` (the tracker's setting) the reference
  takes the first ``max_views`` *eligible cameras by index* — visibility
  ranking only gates eligibility — so selection reduces to a masked sort
  over camera indices
- per selected camera, fit a pinhole crop camera (look-at + focal fit,
  x-mirrored for right hands); fit failures mask the view instead of
  raising
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry import affine
from ..geometry.cameras import arctan_project, fisheye62_distort
from ..geometry.crop import gen_crop_camera_from_points
from ..kinematics.hand import HandModel, neutral_joint_angles
from ..kinematics.skinning import _skin_landmarks_single
from .types import CameraRig, CropSet, TrackerConfig

_BIG = 10_000


def landmarks_from_pose(
    hand_model: HandModel,
    joint_angles: jnp.ndarray,  # [22]
    wrist_xf: jnp.ndarray,  # [4, 4]
    hand_idx: jnp.ndarray,  # scalar int
) -> jnp.ndarray:  # [21, 3]
    """World landmarks; the left-hand model's wrist x-axis is mirrored for
    right hands (perspective_crop.py:40-51)."""
    sign = jnp.where(hand_idx == 1, -1.0, 1.0).astype(wrist_xf.dtype)
    xf = wrist_xf.at[:, 0].multiply(sign)
    return _skin_landmarks_single(hand_model, joint_angles, xf)


def static_crop_points_local(
    hand_model: HandModel, num_crop_points: int
) -> jnp.ndarray | None:
    """Wrist-local landmarks of the pose-INDEPENDENT crop poses (neutral =
    mid joint limits, open = zero angles), pre-mirrored per hand:
    [2, n_extra, 3] (or None when only the GT landmarks are used).

    FK left-multiplies the wrist transform into every skinning frame, so
    ``skin(angles, mirror_x(W)) == W @ diag(-1,1,1) @ skin(angles, I)`` —
    per frame these sets are ONE rigid transform of this constant.  The
    sequence tracker computes it once instead of re-skinning two full poses
    for every (frame, hand), which was the dominant term of crop
    generation (measured 23.5 ms of a 25 ms S=8 prep)."""
    if num_crop_points <= 21:
        return None
    eye = jnp.eye(4, dtype=hand_model.joint_rest_positions.dtype)
    sets = [neutral_joint_angles(hand_model)]
    if num_crop_points > 42:
        sets.append(jnp.zeros_like(sets[0]))
    local = jnp.concatenate(
        [_skin_landmarks_single(hand_model, a, eye) for a in sets], axis=0
    )  # [n_extra, 3], left hand
    right = local.at[:, 0].multiply(-1.0)
    return jnp.stack([local, right], axis=0)


def _crop_points(
    hand_model: HandModel,
    joint_angles: jnp.ndarray,
    wrist_xf: jnp.ndarray,
    hand_idx: jnp.ndarray,
    num_crop_points: int,
    static_pts_local: jnp.ndarray | None = None,  # [n_extra, 3] this hand
    gt_landmarks: jnp.ndarray | None = None,  # [21, 3] if already skinned
) -> jnp.ndarray:  # [num_crop_points, 3]
    if static_pts_local is not None:
        gt = (
            gt_landmarks
            if gt_landmarks is not None
            else landmarks_from_pose(
                hand_model, joint_angles, wrist_xf, hand_idx
            )
        )
        extra = affine.transform3(wrist_xf, static_pts_local)
        return jnp.concatenate([gt, extra], axis=0)
    assert num_crop_points in (21, 42, 63)
    pts = [landmarks_from_pose(hand_model, joint_angles, wrist_xf, hand_idx)]
    if num_crop_points > 21:
        pts.append(
            landmarks_from_pose(
                hand_model, neutral_joint_angles(hand_model), wrist_xf, hand_idx
            )
        )
    if num_crop_points > 42:
        pts.append(
            landmarks_from_pose(
                hand_model,
                jnp.zeros_like(joint_angles),
                wrist_xf,
                hand_idx,
            )
        )
    return jnp.concatenate(pts, axis=0)


def _visibility_counts(
    rig: CameraRig,
    T_world_from_camera: jnp.ndarray,  # [N, 4, 4]
    landmarks_world: jnp.ndarray,  # [21, 3]
) -> jnp.ndarray:  # [N] int32
    """Landmarks in view per camera (perspective_crop.py:54-86)."""

    def count_one(fx, fy, cx, cy, w, h, coeffs, t_wc):
        w2e = affine.rigid_inverse(t_wc)
        eye = affine.transform3(w2e, landmarks_world)
        p = arctan_project(eye)
        q = fisheye62_distort(coeffs, p)
        win = q * jnp.stack([fx, fy]) + jnp.stack([cx, cy])
        vis = (
            (win[..., 0] >= 0)
            & (win[..., 0] <= w - 1)
            & (win[..., 1] >= 0)
            & (win[..., 1] <= h - 1)
            & (eye[..., 2] > 0)
        )
        return jnp.sum(vis).astype(jnp.int32)

    return jax.vmap(count_one)(
        rig.fx, rig.fy, rig.cx, rig.cy, rig.width, rig.height, rig.coeffs,
        T_world_from_camera,
    )


def gen_crops_for_hand(
    rig: CameraRig,
    T_world_from_camera: jnp.ndarray,  # [N, 4, 4]
    hand_model: HandModel,  # mm, left-hand
    joint_angles: jnp.ndarray,  # [22]
    wrist_xf: jnp.ndarray,  # [4, 4] mm
    confidence: jnp.ndarray,  # scalar
    hand_idx: jnp.ndarray,  # scalar int
    config: TrackerConfig,
    min_num_crops: int,
    static_pts_local: jnp.ndarray | None = None,
):
    """Crop cameras for one hand -> per-slot (K, T_world_from_eye, src_idx,
    view_valid) + hand_valid."""
    lm = landmarks_from_pose(hand_model, joint_angles, wrist_xf, hand_idx)
    counts = _visibility_counts(rig, T_world_from_camera, lm)
    eligible = counts >= config.min_required_vis_landmarks

    n = rig.num_cameras
    key = jnp.where(eligible, jnp.arange(n), _BIG)
    order = jnp.sort(key)[: config.max_views]
    slot_has_cam = order < _BIG
    src_idx = jnp.where(slot_has_cam, order, 0).astype(jnp.int32)

    crop_pts = _crop_points(
        hand_model, joint_angles, wrist_xf, hand_idx,
        config.num_crop_points, static_pts_local, gt_landmarks=lm,
    )

    def fit_one(cam_idx):
        return gen_crop_camera_from_points(
            T_world_from_camera[cam_idx],
            crop_pts,
            config.crop_size,
            mirror_img_x=hand_idx == 1,
            camera_angle_deg=rig.camera_angles[cam_idx],
            focal_multiplier=config.hand_ratio_in_crop,
        )

    crops = jax.vmap(fit_one)(src_idx)
    view_valid = slot_has_cam & crops.valid

    # Pack valid views to the front (stable), so slot 0 is always the
    # reference cam0 of the sample.
    pack = jnp.argsort(~view_valid)
    view_valid = view_valid[pack]
    src_idx = src_idx[pack]
    intrinsics = crops.intrinsics_matrix()[pack]
    t_world_from_eye = crops.T_world_from_eye[pack]

    n_views = jnp.sum(view_valid).astype(jnp.int32)
    hand_valid = (confidence >= config.confidence_threshold) & (
        n_views >= min_num_crops
    )
    return intrinsics, t_world_from_eye, src_idx, view_valid, hand_valid, n_views


def gen_crop_set(
    rig: CameraRig,
    T_world_from_camera: jnp.ndarray,
    hand_model: HandModel,
    gt_joint_angles: jnp.ndarray,  # [2, 22]
    gt_wrist_xfs: jnp.ndarray,  # [2, 4, 4]
    gt_confidences: jnp.ndarray,  # [2]
    config: TrackerConfig,
    min_num_crops: int,
    static_pts_local: jnp.ndarray | None = None,  # [2, n_extra, 3]
) -> CropSet:
    """Dense 2-hand crop set (reference gen_crop_cameras, tracker.py:101-139).

    ``static_pts_local`` (from :func:`static_crop_points_local`) supplies
    the constant neutral/open crop-point sets; callers that process whole
    sequences compute it once instead of per frame."""

    def per_hand(angles, wrist, conf, hand_idx, static_h):
        return gen_crops_for_hand(
            rig, T_world_from_camera, hand_model, angles, wrist, conf,
            hand_idx, config, min_num_crops, static_h,
        )

    if static_pts_local is None:
        per_hand_fn = lambda a, w, c, h: per_hand(a, w, c, h, None)
        intr, twfe, src, vv, hv, nv = jax.vmap(per_hand_fn)(
            gt_joint_angles, gt_wrist_xfs, gt_confidences,
            jnp.arange(2, dtype=jnp.int32),
        )
    else:
        intr, twfe, src, vv, hv, nv = jax.vmap(per_hand)(
            gt_joint_angles, gt_wrist_xfs, gt_confidences,
            jnp.arange(2, dtype=jnp.int32), static_pts_local,
        )
    return CropSet(
        intrinsics=intr,
        T_world_from_eye=twfe,
        src_cam_idx=src,
        view_valid=vv,
        hand_valid=hv,
        n_views=nv,
    )

"""Synthetic multi-view sequence generator (tests, benchmarks, demos).

Builds a 4-camera fisheye rig around a hand-sized workspace, animates GT
poses from the generic hand model, and renders smooth pseudo-images.  Real
UmeTrack_data is not bundled with this checkout; this generator exercises
the full pipeline with the same shapes/units/schemas.
"""
from __future__ import annotations

import json
import os

import numpy as np

GENERIC_HAND_JSON = os.environ.get(
    "UMETRACK_GENERIC_HAND_JSON",
    os.path.join(os.path.dirname(__file__), "..", "..", "assets",
                 "generic_hand_model.json"),
)

CAM_JS = {
    "ImageSizeX": 640,
    "ImageSizeY": 480,
    "DistortionModel": "FishEye62",
    "fx": 275.0,
    "fy": 275.0,
    "cx": 319.5,
    "cy": 239.5,
    "k1": 0.35,
    "k2": 0.27,
    "k3": -0.5,
    "k4": 0.4,
    "p1": 1e-4,
    "p2": -2e-4,
    "k5": 0.0,
    "k6": 0.0,
}

N_CAMS = 4


def load_generic_hand_dict():
    path = GENERIC_HAND_JSON
    if not os.path.exists(path):
        alt = "/root/reference/dataset/generic_hand_model.json"
        if os.path.exists(alt):
            path = alt
    with open(path) as fp:
        return json.load(fp)


def look_at_pose(position, target):
    """Camera-to-world with +z looking from position toward target."""
    z = target - position
    z = z / np.linalg.norm(z)
    up = np.array([0.0, 1.0, 0.0])
    if abs(np.dot(z, up)) > 0.95:
        up = np.array([1.0, 0.0, 0.0])
    x = np.cross(up, z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    m = np.eye(4)
    m[:3, 0] = x
    m[:3, 1] = y
    m[:3, 2] = z
    m[:3, 3] = position
    return m


def make_camera_poses():
    """Four cameras ~450 mm out, looking at the origin (mm world units)."""
    positions = np.array(
        [
            [-120.0, -60.0, -430.0],
            [120.0, -60.0, -430.0],
            [-150.0, 80.0, -410.0],
            [150.0, 80.0, -410.0],
        ]
    )
    return np.stack([look_at_pose(p, np.zeros(3)) for p in positions]).astype(
        np.float32
    )


def smooth_images(rng, t, n=N_CAMS, h=480, w=640):
    """Temporally-varying smooth noise images, uint8 [T, N, H, W]."""
    import cv2

    base = rng.uniform(40, 220, size=(t, n, 15, 20)).astype(np.float32)
    out = np.empty((t, n, h, w), np.uint8)
    for i in range(t):
        for c in range(n):
            img = cv2.resize(base[i, c], (w, h), interpolation=cv2.INTER_CUBIC)
            out[i, c] = np.clip(img, 0, 255).astype(np.uint8)
    return out


def make_gt_motion(rng, t, hand_dict):
    """GT joint angles / wrist transforms / confidences for two hands.

    Wrists hover near the origin with slow translation + rotation; angles
    interpolate inside joint limits.  A confidence dropout knocks hand 1 out
    for a few frames mid-sequence.
    """
    from scipy.spatial.transform import Rotation

    limits = np.asarray(hand_dict["joint_limits"], np.float32)  # [22, 2]
    angles = np.zeros((t, 2, 22), np.float32)
    wrists = np.zeros((t, 2, 4, 4), np.float32)
    conf = np.ones((t, 2), np.float32)

    for hand in range(2):
        phase = rng.uniform(0, 2 * np.pi, size=22)
        freq = rng.uniform(0.02, 0.08, size=22)
        mid = (limits[:, 0] + limits[:, 1]) / 2
        amp = (limits[:, 1] - limits[:, 0]) / 4
        for ti in range(t):
            angles[ti, hand] = mid + amp * np.sin(freq * ti + phase)

        base_pos = np.array([(-60.0 if hand == 0 else 60.0), 0.0, 0.0])
        axis = rng.standard_normal(3)
        axis /= np.linalg.norm(axis)
        base_rot = Rotation.from_rotvec(
            rng.uniform(0, np.pi) * np.array([0, 0, 1.0])
        )
        for ti in range(t):
            r = Rotation.from_rotvec(axis * 0.02 * ti) * base_rot
            m = np.eye(4, dtype=np.float32)
            m[:3, :3] = r.as_matrix()
            m[:3, 3] = base_pos + np.array(
                [20 * np.sin(0.05 * ti), 15 * np.cos(0.04 * ti),
                 10 * np.sin(0.03 * ti)]
            )
            wrists[ti, hand] = m

    lo = t // 3
    conf[lo: lo + 3, 1] = 0.0
    return angles, wrists, conf


def make_labels_dict(t, rng_seed=0, with_dropout=True):
    """Full label dict in the raw_data JSON schema + image tensor."""
    rng = np.random.default_rng(rng_seed)
    hand_dict = load_generic_hand_dict()

    cam_poses = make_camera_poses()
    angles, wrists, conf = make_gt_motion(rng, t, hand_dict)
    if not with_dropout:
        conf[:] = 1.0
    images = smooth_images(rng, t)

    labels = {
        "cameras": [dict(CAM_JS) for _ in range(N_CAMS)],
        "camera_angles": [0.0, 0.0, 180.0, 180.0],
        "camera_to_world_transforms": np.tile(cam_poses, (t, 1, 1, 1)).tolist(),
        "joint_angles": angles.tolist(),
        "wrist_transforms": wrists.tolist(),
        "hand_confidences": conf.tolist(),
        "hand_model": hand_dict,
    }
    return labels, images


def our_sequence(labels, images):
    """Build device-side FrameObservation (leading T axis) + rig + hand."""
    import jax.numpy as jnp

    from ..kinematics.hand import from_dict
    from ..tracker.types import FrameObservation
    from ..tracker.video import rig_from_labels

    rig = rig_from_labels(labels)
    seq = FrameObservation(
        images=jnp.asarray(images),
        T_world_from_camera=jnp.asarray(
            np.asarray(labels["camera_to_world_transforms"], np.float32)
        ),
        gt_joint_angles=jnp.asarray(
            np.asarray(labels["joint_angles"], np.float32)
        ),
        gt_wrist_xfs=jnp.asarray(
            np.asarray(labels["wrist_transforms"], np.float32)
        ),
        gt_confidences=jnp.asarray(
            np.asarray(labels["hand_confidences"], np.float32)
        ),
    )
    hand = from_dict(labels["hand_model"])
    return rig, seq, hand


def make_torchdata_sample(rng_seed=0, t=3, v=2, h=120, w=160, hand_idx=1):
    """Synthetic raw torch_data sample in the reference msgpack schema
    (pinhole views looking at a hand-sized blob near the origin, mm units)."""
    rng = np.random.default_rng(rng_seed)
    hand_dict = make_labels_dict(1, rng_seed)[0]["hand_model"]

    cam_poses = make_camera_poses()[:v]  # [V, 4, 4] mm
    extr = np.stack(
        [np.linalg.inv(p).astype(np.float32) for p in cam_poses]
    )  # world->eye
    extr = np.tile(extr, (t, 1, 1, 1))

    intr = np.tile(np.eye(3, dtype=np.float32), (t, v, 1, 1))
    intr[..., 0, 0] = intr[..., 1, 1] = 200.0
    intr[..., 0, 2] = (w - 1) / 2
    intr[..., 1, 2] = (h - 1) / 2

    enclosing = rng.uniform(-80, 80, size=(t, 63, 3)).astype(np.float32)

    angles = rng.uniform(-0.5, 0.5, size=(t, 22)).astype(np.float32)
    solved_angles = angles + rng.normal(0, 0.05, size=(t, 22)).astype(np.float32)
    wrist = np.tile(np.eye(4, dtype=np.float32), (t, 1, 1))
    wrist[:, :3, 3] = rng.uniform(-50, 50, size=(t, 3))
    solved_wrist = wrist.copy()

    import cv2

    base = rng.uniform(0, 255, size=(t * v, 12, 16)).astype(np.float32)
    mono = np.stack(
        [
            cv2.resize(b, (w, h), interpolation=cv2.INTER_CUBIC).clip(0, 255)
            for b in base
        ]
    ).astype(np.uint8).reshape(t, v, h, w)

    labels = {
        "extrinsics": extr.tolist(),
        "intrinsics": intr.tolist(),
        "enclosing_points": enclosing.tolist(),
        "hand": [float(hand_idx)] * t,
        "hand_model": hand_dict,
        "wrist": wrist.tolist(),
        "joint_angles": angles.tolist(),
        "solved_wrist_xfs": solved_wrist.tolist(),
        "solved_joint_angles": solved_angles.tolist(),
        "generic_hand_model": hand_dict,
        "pinch": [0.0] * t,
    }
    return mono, labels

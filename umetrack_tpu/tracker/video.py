"""Host-side video + label loading for raw_data sequences.

Counterpart of the reference ``lib/tracker/video_pose_data.py``: an ``X.mp4``
holding a horizontally-concatenated N-camera mono strip paired with an
``X.json`` holding cameras, per-frame camera poses, GT joint angles / wrist
transforms / confidences and the per-user hand model.  Decode uses OpenCV
(PyAV is unavailable here); everything is returned as dense numpy arrays
ready to ship to the device in one transfer.
"""
from __future__ import annotations

import dataclasses
import json
from typing import List, Optional

import numpy as np

from ..kinematics.hand import HandModel, from_dict as hand_from_dict
from .types import CameraRig


@dataclasses.dataclass
class SequenceData:
    """A fully-loaded raw_data sequence (host numpy)."""

    images: np.ndarray  # [T, N, H, W] uint8
    T_world_from_camera: np.ndarray  # [T, N, 4, 4]
    gt_joint_angles: np.ndarray  # [T, 2, 22]
    gt_wrist_xfs: np.ndarray  # [T, 2, 4, 4] (mm)
    gt_confidences: np.ndarray  # [T, 2]
    rig: CameraRig
    hand_model_mm: HandModel
    n_frames: int


def load_labels(label_path: str):
    with open(label_path, "r") as fp:
        return json.load(fp)


def rig_from_labels(labels: dict) -> CameraRig:
    """Build the N-camera fisheye rig pytree from the label JSON's camera
    blocks (video_pose_data.py:75-93 schema)."""
    import jax.numpy as jnp

    cams = [c.get("Camera", c) for c in labels["cameras"]]
    names = ("k1", "k2", "k3", "k4", "p1", "p2", "k5", "k6")
    return CameraRig(
        fx=jnp.asarray([c["fx"] for c in cams], jnp.float32),
        fy=jnp.asarray([c["fy"] for c in cams], jnp.float32),
        cx=jnp.asarray([c["cx"] for c in cams], jnp.float32),
        cy=jnp.asarray([c["cy"] for c in cams], jnp.float32),
        width=jnp.asarray([c["ImageSizeX"] for c in cams], jnp.float32),
        height=jnp.asarray([c["ImageSizeY"] for c in cams], jnp.float32),
        coeffs=jnp.asarray(
            [[c.get(n, 0.0) for n in names] for c in cams], jnp.float32
        ),
        camera_angles=jnp.asarray(labels["camera_angles"], jnp.float32),
    )


def decode_video_strip(video_path: str, n_cameras: int) -> np.ndarray:
    """Decode an N-camera mono strip mp4 -> [T, N, H, W] uint8
    (split per video_pose_data.py:123-125)."""
    import cv2

    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise IOError(f"cannot open video: {video_path}")
    frames: List[np.ndarray] = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        mono = frame[..., 0]  # mono stored in every channel
        h, total_w = mono.shape
        frames.append(
            np.moveaxis(mono.reshape(h, n_cameras, total_w // n_cameras), 1, 0)
        )
    cap.release()
    return np.stack(frames)


def stream_video_strip(video_path: str, n_cameras: int, chunk_size: int):
    """Decode an N-camera strip mp4 in bounded-memory chunks.

    Generator of ``[C, N, H, W]`` uint8 blocks (C <= chunk_size); the host
    never holds more than one chunk, matching the reference's frame-by-frame
    ``VideoStream`` (video_pose_data.py:37-55) but block-granular so each
    device submission still batches C frames.
    """
    import cv2

    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise IOError(f"cannot open video: {video_path}")
    buf: List[np.ndarray] = []
    try:
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            mono = frame[..., 0]
            h, total_w = mono.shape
            buf.append(
                np.moveaxis(
                    mono.reshape(h, n_cameras, total_w // n_cameras), 1, 0
                )
            )
            if len(buf) == chunk_size:
                yield np.stack(buf)
                buf = []
        if buf:
            yield np.stack(buf)
    finally:
        cap.release()


@dataclasses.dataclass
class SequenceStream:
    """Bounded-memory raw_data sequence: labels fully loaded (small), video
    decoded lazily in chunks via :meth:`chunks`.

    ``images`` may hold an in-memory [T, N, H, W] source instead of a video
    file (synthetic data, tests); the bounded-memory property then applies
    to the device side only.
    """

    video_path: Optional[str]
    T_world_from_camera: np.ndarray  # [T, N, 4, 4]
    gt_joint_angles: np.ndarray  # [T, 2, 22]
    gt_wrist_xfs: np.ndarray  # [T, 2, 4, 4] (mm)
    gt_confidences: np.ndarray  # [T, 2]
    rig: CameraRig
    hand_model_mm: HandModel
    n_frames: int
    images: Optional[np.ndarray] = None

    def chunks(self, chunk_size: int):
        """Yield ``(t0, images[C, N, H, W])`` blocks, C <= chunk_size."""
        if self.images is not None:
            for t0 in range(0, self.n_frames, chunk_size):
                yield t0, self.images[t0:t0 + chunk_size]
            return
        n_cameras = int(self.rig.num_cameras)
        t0 = 0
        for images in stream_video_strip(
            self.video_path, n_cameras, chunk_size
        ):
            yield t0, images
            t0 += len(images)
        assert t0 == self.n_frames, (
            f"video frames ({t0}) != label frames ({self.n_frames})"
        )


def stream_from_data(seq: SequenceData) -> SequenceStream:
    """Wrap an in-memory SequenceData as a stream (synthetic data, tests)."""
    return SequenceStream(
        video_path=None,
        T_world_from_camera=seq.T_world_from_camera,
        gt_joint_angles=seq.gt_joint_angles,
        gt_wrist_xfs=seq.gt_wrist_xfs,
        gt_confidences=seq.gt_confidences,
        rig=seq.rig,
        hand_model_mm=seq.hand_model_mm,
        n_frames=seq.n_frames,
        images=seq.images,
    )


def open_sequence(
    video_path: str, label_path: Optional[str] = None
) -> SequenceStream:
    """Open a raw_data sequence for streaming: parse labels (small) but defer
    video decode to :meth:`SequenceStream.chunks`."""
    if label_path is None:
        label_path = video_path[:-4] + ".json"
    labels = load_labels(label_path)
    rig = rig_from_labels(labels)

    joint_angles = np.asarray(labels["joint_angles"], np.float32)
    wrist = np.asarray(labels["wrist_transforms"], np.float32)
    conf = np.asarray(labels["hand_confidences"], np.float32)
    cam_poses = np.asarray(labels["camera_to_world_transforms"], np.float32)
    hand_model = hand_from_dict(labels["hand_model"])

    n = len(joint_angles)
    invalid = cam_poses.reshape(n, -1).sum(axis=-1) == 0
    cam_poses[invalid] = np.eye(4, dtype=np.float32)
    conf[invalid] = 0.0

    return SequenceStream(
        video_path=video_path,
        T_world_from_camera=cam_poses,
        gt_joint_angles=joint_angles,
        gt_wrist_xfs=wrist,
        gt_confidences=conf,
        rig=rig,
        hand_model_mm=hand_model,
        n_frames=n,
    )


def load_sequence(video_path: str, label_path: Optional[str] = None) -> SequenceData:
    """Load one raw_data sequence: mp4 strip + JSON labels."""
    if label_path is None:
        label_path = video_path[:-4] + ".json"
    labels = load_labels(label_path)
    rig = rig_from_labels(labels)
    n_cameras = int(rig.num_cameras)

    images = decode_video_strip(video_path, n_cameras)
    joint_angles = np.asarray(labels["joint_angles"], np.float32)
    wrist = np.asarray(labels["wrist_transforms"], np.float32)
    conf = np.asarray(labels["hand_confidences"], np.float32)
    cam_poses = np.asarray(labels["camera_to_world_transforms"], np.float32)
    hand_model = hand_from_dict(labels["hand_model"])

    n = len(images)
    assert n == len(joint_angles), (
        f"video frames ({n}) != label frames ({len(joint_angles)})"
    )
    # Untracked-camera frames have all-zero poses and no GT
    # (video_pose_data.py:126-132); replace with identity + zero confidence
    # so the device pipeline stays finite.
    invalid = cam_poses.reshape(n, -1).sum(axis=-1) == 0
    cam_poses[invalid] = np.eye(4, dtype=np.float32)
    conf[invalid] = 0.0

    return SequenceData(
        images=images,
        T_world_from_camera=cam_poses,
        gt_joint_angles=joint_angles,
        gt_wrist_xfs=wrist,
        gt_confidences=conf,
        rig=rig,
        hand_model_mm=hand_model,
        n_frames=n,
    )

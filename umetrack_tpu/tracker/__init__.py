from . import crops, tracker, types, video
from .crops import gen_crop_set, landmarks_from_pose
from .tracker import (
    HandTracker,
    calibrate_sequence,
    sequence_landmarks,
    track_frame,
    track_sequence,
    track_sequences_batched,
)
from .types import (
    CameraRig,
    CropSet,
    FrameObservation,
    FrameResult,
    TrackState,
    TrackerConfig,
)

__all__ = [
    "crops",
    "tracker",
    "types",
    "video",
    "gen_crop_set",
    "landmarks_from_pose",
    "HandTracker",
    "calibrate_sequence",
    "sequence_landmarks",
    "track_frame",
    "track_sequence",
    "track_sequences_batched",
    "CameraRig",
    "CropSet",
    "FrameObservation",
    "FrameResult",
    "TrackState",
    "TrackerConfig",
]

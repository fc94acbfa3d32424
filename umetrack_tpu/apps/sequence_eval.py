"""Shared raw_data sequence-eval machinery for the eval apps.

Handles host->device staging, sequence padding to length buckets (one XLA
compile per bucket instead of per sequence length), the known/unknown
protocols, and the per-sequence result artifact (same pickle schema as the
reference, run_eval_known_skeleton.py:92-100, plus joint angles for MPJPA).
"""
from __future__ import annotations

import logging
import os
import pickle
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data import fs
from ..kinematics.hand import HandModel, scaled_hand_model
from ..tracker import HandTracker, sequence_landmarks
from ..tracker.types import FrameObservation
from ..tracker.video import SequenceData

logger = logging.getLogger(__name__)

PAD_BUCKET = 64


def find_input_output_files(
    input_dir: str, output_dir: str, test_only: bool = True
) -> Tuple[list, list]:
    """mp4/json pairs under input_dir -> (input_paths, output .npy paths)
    (reference run_eval_known_skeleton.py:31-45)."""
    import fnmatch

    inputs, outputs = [], []
    for cur_dir, _, filenames in fs.walk(input_dir):
        if test_only and "testing" not in cur_dir:
            continue
        for fname in sorted(fnmatch.filter(filenames, "*.mp4")):
            full = fs.join(cur_dir, fname)
            rel = full[len(input_dir):].lstrip("/")
            inputs.append(full)
            outputs.append(fs.join(output_dir, rel[:-4] + ".npy"))
    logger.info("Found %d sequences under %s", len(inputs), input_dir)
    return inputs, outputs


def to_observation(seq: SequenceData, pad_bucket: int = PAD_BUCKET):
    """Device-side FrameObservation padded to a length bucket; padded frames
    carry zero confidence so they track as invalid."""
    t = seq.n_frames
    t_pad = -(-t // pad_bucket) * pad_bucket

    def pad(a):
        if len(a) == t_pad:
            return a
        widths = [(0, t_pad - t)] + [(0, 0)] * (a.ndim - 1)
        return np.pad(a, widths, mode="edge")

    conf = np.pad(
        seq.gt_confidences, [(0, t_pad - t), (0, 0)], constant_values=0.0
    )
    return FrameObservation(
        images=jnp.asarray(pad(seq.images)),
        T_world_from_camera=jnp.asarray(pad(seq.T_world_from_camera)),
        gt_joint_angles=jnp.asarray(pad(seq.gt_joint_angles)),
        gt_wrist_xfs=jnp.asarray(pad(seq.gt_wrist_xfs)),
        gt_confidences=jnp.asarray(conf),
    )


def eval_sequence_known(
    tracker: HandTracker,
    seq: SequenceData,
    skel_hand_model_mm: Optional[HandModel] = None,
    lm_hand_model_mm: Optional[HandModel] = None,
    min_num_crops: int = 1,
) -> Dict[str, np.ndarray]:
    """Track one sequence and produce the eval artifact.

    ``skel_hand_model_mm`` overrides the model's skeleton input (calibrated
    skeleton in the unknown protocol); ``lm_hand_model_mm`` the model used to
    skin tracked landmarks.  Both default to the sequence's GT hand model.
    """
    obs = to_observation(seq)
    t = seq.n_frames

    results, _ = tracker.track_sequence(
        seq.rig, obs, seq.hand_model_mm, min_num_crops=min_num_crops,
        skel_hand_model_mm=skel_hand_model_mm,
    )
    lm_model = lm_hand_model_mm if lm_hand_model_mm is not None else seq.hand_model_mm

    tracked_lm = sequence_landmarks(
        lm_model, results.joint_angles, results.wrist_xfs
    )
    gt_lm = sequence_landmarks(
        seq.hand_model_mm, obs.gt_joint_angles, obs.gt_wrist_xfs
    )

    valid = np.asarray(results.valid)[:t]  # [T, 2]
    valid_ht = np.moveaxis(valid, 0, 1)  # [2, T] reference layout
    zero_if_invalid = np.where(valid[..., None, None], 1.0, 0.0)

    tracked = np.moveaxis(np.asarray(tracked_lm)[:t] * zero_if_invalid, 0, 1)
    gt = np.moveaxis(np.asarray(gt_lm)[:t] * zero_if_invalid, 0, 1)

    return {
        "tracked_keypoints": tracked,  # [2, T, 21, 3] mm
        "gt_keypoints": gt,
        "valid_tracking": valid_ht,
        "tracked_joint_angles": np.moveaxis(
            np.asarray(results.joint_angles)[:t], 0, 1
        ),
        "gt_joint_angles": np.moveaxis(np.asarray(seq.gt_joint_angles), 0, 1),
    }


def eval_sequence_unknown(
    tracker: HandTracker,
    seq: SequenceData,
    generic_hand_model_mm: HandModel,
    n_calibration_samples: int = 30,
) -> Dict[str, np.ndarray]:
    """Two-pass unknown-skeleton protocol (run_eval_unknown_skeleton.py):
    calibrate the generic skeleton's scale on 2-view frames, then retrack
    with the calibrated skeleton (crops still from the GT skeleton)."""
    obs = to_observation(seq)
    scale = tracker.calibrate_sequence(
        seq.rig, obs, seq.hand_model_mm,
        n_calibration_samples=n_calibration_samples,
    )
    calibrated = scaled_hand_model(generic_hand_model_mm, scale)
    logger.info("calibrated scale: %.4f", float(scale))
    out = eval_sequence_known(
        tracker, seq,
        skel_hand_model_mm=calibrated,
        lm_hand_model_mm=calibrated,
        min_num_crops=1,
    )
    out["calibrated_scale"] = np.asarray(scale)
    return out


def save_artifact(output_path: str, artifact: Dict[str, np.ndarray]) -> None:
    os.makedirs(fs.dirname(output_path), exist_ok=True)
    with open(output_path, "wb") as fp:
        pickle.dump(artifact, fp)


def sequence_mean_error(artifact: Dict[str, np.ndarray]) -> float:
    v = artifact["valid_tracking"].astype(bool)
    diff = (artifact["gt_keypoints"] - artifact["tracked_keypoints"])[v]
    if diff.size == 0:
        return float("nan")
    return float(np.linalg.norm(diff, axis=-1).mean())

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
from ..data.dataset import prefetch_map
from ..kinematics.hand import HandModel, scaled_hand_model
from ..tracker import HandTracker, sequence_landmarks
from ..tracker.types import FrameObservation
from ..tracker.video import SequenceData, SequenceStream
from ..utils.profiling import PhaseTimers

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


def _chunk_observation(
    stream: SequenceStream, t0: int, images: np.ndarray, chunk: int
) -> FrameObservation:
    """FrameObservation for frames [t0, t0+len(images)), padded to ``chunk``
    exactly like :func:`to_observation` pads the sequence tail (edge images /
    poses, zero confidence) so chunked tracking is bit-identical."""
    c = len(images)
    sl = slice(t0, t0 + c)

    def pad(a):
        if c == chunk:
            return a
        widths = [(0, chunk - c)] + [(0, 0)] * (a.ndim - 1)
        return np.pad(a, widths, mode="edge")

    conf = np.pad(
        stream.gt_confidences[sl], [(0, chunk - c), (0, 0)],
        constant_values=0.0,
    )
    return FrameObservation(
        images=jnp.asarray(pad(images)),
        T_world_from_camera=jnp.asarray(pad(stream.T_world_from_camera[sl])),
        gt_joint_angles=jnp.asarray(pad(stream.gt_joint_angles[sl])),
        gt_wrist_xfs=jnp.asarray(pad(stream.gt_wrist_xfs[sl])),
        gt_confidences=jnp.asarray(conf),
    )


def eval_sequence_known_streaming(
    tracker: HandTracker,
    stream: SequenceStream,
    skel_hand_model_mm: Optional[HandModel] = None,
    lm_hand_model_mm: Optional[HandModel] = None,
    min_num_crops: int = 1,
    chunk: int = PAD_BUCKET,
    timers: Optional[PhaseTimers] = None,
) -> Dict[str, np.ndarray]:
    """Bounded-memory version of :func:`eval_sequence_known`: video decoded
    ``chunk`` frames at a time (reference VideoStream decodes frame-by-frame,
    video_pose_data.py:37-55), with the ``TrackState`` carried across chunks
    so results are bit-identical to whole-sequence tracking.  Peak host and
    device image memory is O(chunk), independent of sequence length."""
    t = stream.n_frames
    lm_model = (
        lm_hand_model_mm if lm_hand_model_mm is not None
        else stream.hand_model_mm
    )
    timers = timers if timers is not None else PhaseTimers()

    # Decode the next chunk on a host thread while the device tracks the
    # current one (the analog of the reference's asyncio prefetcher).
    chunks = prefetch_map(lambda x: x, stream.chunks(chunk),
                          num_threads=1, max_prefetch=1)

    state = tracker.init_state()
    angles_parts, valid_parts = [], []
    tracked_lm_parts = []
    for t0, images in chunks:
        c = len(images)
        with timers.phase("stage", items=c):
            obs = _chunk_observation(stream, t0, images, chunk)
        with timers.phase("track", items=c, barrier=lambda: tracked_lm):
            results, state = tracker.track_sequence(
                stream.rig, obs, stream.hand_model_mm,
                min_num_crops=min_num_crops, init_state=state,
                skel_hand_model_mm=skel_hand_model_mm,
            )
            tracked_lm = sequence_landmarks(
                lm_model, results.joint_angles, results.wrist_xfs
            )
        with timers.phase("fetch", items=c):
            angles_parts.append(np.asarray(results.joint_angles)[:c])
            valid_parts.append(np.asarray(results.valid)[:c])
            tracked_lm_parts.append(np.asarray(tracked_lm)[:c])

    joint_angles = np.concatenate(angles_parts)  # [T, 2, 22]
    valid = np.concatenate(valid_parts)  # [T, 2]
    tracked_lm = np.concatenate(tracked_lm_parts)  # [T, 2, 21, 3]

    gt_lm = np.asarray(
        sequence_landmarks(
            stream.hand_model_mm,
            jnp.asarray(stream.gt_joint_angles),
            jnp.asarray(stream.gt_wrist_xfs),
        )
    )

    zero_if_invalid = np.where(valid[..., None, None], 1.0, 0.0)
    tracked = np.moveaxis(tracked_lm * zero_if_invalid, 0, 1)
    gt = np.moveaxis(gt_lm[:t] * zero_if_invalid, 0, 1)

    return {
        "tracked_keypoints": tracked,  # [2, T, 21, 3] mm
        "gt_keypoints": gt,
        "valid_tracking": np.moveaxis(valid, 0, 1),
        "tracked_joint_angles": np.moveaxis(joint_angles, 0, 1),
        "gt_joint_angles": np.moveaxis(stream.gt_joint_angles, 0, 1),
    }


def calibrate_streaming(
    tracker: HandTracker,
    stream: SequenceStream,
    n_calibration_samples: int = 30,
    chunk: int = PAD_BUCKET,
) -> float:
    """Unknown-skeleton pass 1 with bounded memory: accumulate per-frame
    scale predictions chunk by chunk, stopping at ``n_calibration_samples``
    valid ones (frame-major, hand 0 before hand 1 — the reference's append
    order, run_eval_unknown_skeleton.py:66-74)."""
    state = tracker.init_state()
    scales_all, valid_all = [], []
    n_valid = 0
    for t0, images in stream.chunks(chunk):
        c = len(images)
        obs = _chunk_observation(stream, t0, images, chunk)
        scales, valid, state = tracker.predict_scales(
            stream.rig, obs, stream.hand_model_mm, init_state=state,
        )
        scales_all.append(np.asarray(scales)[:c].reshape(-1))
        valid_all.append(np.asarray(valid)[:c].reshape(-1))
        n_valid += int(valid_all[-1].sum())
        if n_calibration_samples and n_valid >= n_calibration_samples:
            break
    scales = np.concatenate(scales_all)
    valid = np.concatenate(valid_all)
    if n_calibration_samples:
        take = valid & (np.cumsum(valid.astype(np.int64)) <= n_calibration_samples)
    else:
        take = valid
    denom = max(int(take.sum()), 1)
    return float((scales * take).sum() / denom)


def eval_sequence_unknown_streaming(
    tracker: HandTracker,
    stream: SequenceStream,
    generic_hand_model_mm: HandModel,
    n_calibration_samples: int = 30,
    chunk: int = PAD_BUCKET,
) -> Dict[str, np.ndarray]:
    """Two-pass unknown-skeleton protocol, bounded memory.  Like the
    reference, the video is decoded twice (run_eval_unknown_skeleton.py
    re-streams for pass 2)."""
    scale = calibrate_streaming(
        tracker, stream, n_calibration_samples=n_calibration_samples,
        chunk=chunk,
    )
    calibrated = scaled_hand_model(generic_hand_model_mm, scale)
    logger.info("calibrated scale: %.4f", scale)
    out = eval_sequence_known_streaming(
        tracker, stream,
        skel_hand_model_mm=calibrated,
        lm_hand_model_mm=calibrated,
        min_num_crops=1,
        chunk=chunk,
    )
    out["calibrated_scale"] = np.asarray(scale)
    return out


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

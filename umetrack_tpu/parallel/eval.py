"""Distributed sequence evaluation over a device mesh.

Scale-out design (SURVEY §2.3): sequences shard over the mesh's ``data``
axis (the conv-RNN recurrence keeps each sequence on one device); weights
replicate; metric reduction happens on-device via XLA-inserted collectives
instead of the reference's filesystem-based aggregation.  Multi-host runs
additionally shard the *recording list* per process (host-local video
decode) — see apps.run_eval_known_skeleton's --rank/--world-size.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..kinematics.hand import HandModel, scaled_hand_model
from ..models.umetrack import TemporalState, UmeTrackNet
from ..tracker.crops import landmarks_from_pose
from ..tracker.tracker import (
    calibrate_sequences_batched,
    track_sequences_batched,
)
from ..tracker.types import CameraRig, FrameObservation, TrackState, TrackerConfig


def make_batched_state(model: UmeTrackNet, n_sequences: int) -> TrackState:
    """Flat [2S]-row tracker state for the batched/sharded path."""
    return TrackState(
        temporal=TemporalState.zeros(2 * n_sequences, model.config),
        valid_history=jnp.zeros((2 * n_sequences,), bool),
    )


@partial(jax.jit, static_argnames=("model", "config", "min_num_crops"))
def eval_sequences_batched(
    model: UmeTrackNet,
    config: TrackerConfig,
    variables,
    rigs: CameraRig,  # [S, ...]
    seqs: FrameObservation,  # [S, T, ...]
    init_state: TrackState,  # [2S, ...]
    hand_models_mm: HandModel,  # [S, ...]
    min_num_crops: int = 1,
    skel_hand_models_mm: HandModel = None,
    lm_hand_models_mm: HandModel = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Track S sequences and compute per-sequence mean landmark error (mm).

    ``skel_hand_models_mm`` overrides the model's skeleton input and
    ``lm_hand_models_mm`` the skeleton used to skin tracked landmarks (the
    unknown protocol passes the calibrated generic skeleton for both;
    crops/GT always come from ``hand_models_mm``).

    Returns (per_sequence_error, per_sequence_valid_frames, global_mean) —
    the global mean is an on-device cross-shard reduction.
    """
    results, _ = track_sequences_batched(
        model, config, variables, rigs, seqs, init_state, hand_models_mm,
        min_num_crops, skel_hand_models_mm,
    )
    # results leaves [T, S, 2, ...] -> landmarks per (seq, frame, hand)
    angles = jnp.moveaxis(results.joint_angles, 0, 1)  # [S, T, 2, 22]
    wrists = jnp.moveaxis(results.wrist_xfs, 0, 1)
    valid = jnp.moveaxis(results.valid, 0, 1)  # [S, T, 2]

    def seq_landmarks(hand, a, w):
        def frame(a_t, w_t):
            return jax.vmap(
                lambda aa, ww, h: landmarks_from_pose(hand, aa, ww, h)
            )(a_t, w_t, jnp.arange(2, dtype=jnp.int32))

        return jax.vmap(frame)(a, w)  # [T, 2, 21, 3]

    lm_models = (
        hand_models_mm if lm_hand_models_mm is None else lm_hand_models_mm
    )
    tracked = jax.vmap(seq_landmarks)(lm_models, angles, wrists)
    gt = jax.vmap(seq_landmarks)(
        hand_models_mm, seqs.gt_joint_angles, seqs.gt_wrist_xfs
    )

    err = jnp.linalg.norm(tracked - gt, axis=-1).mean(axis=-1)  # [S, T, 2]
    vmask = valid.astype(err.dtype)
    per_seq_err = jnp.sum(err * vmask, axis=(1, 2)) / jnp.maximum(
        jnp.sum(vmask, axis=(1, 2)), 1.0
    )
    n_valid = jnp.sum(vmask, axis=(1, 2))
    global_mean = jnp.sum(per_seq_err * (n_valid > 0)) / jnp.maximum(
        jnp.sum((n_valid > 0).astype(err.dtype)), 1.0
    )
    return per_seq_err, n_valid, global_mean


@partial(
    jax.jit,
    static_argnames=("model", "config", "n_calibration_samples", "min_num_crops"),
)
def eval_sequences_unknown_batched(
    model: UmeTrackNet,
    config: TrackerConfig,
    variables,
    rigs: CameraRig,  # [S, ...]
    seqs: FrameObservation,  # [S, T, ...]
    hand_models_mm: HandModel,  # [S, ...] GT skeletons (crops + GT landmarks)
    generic_hand_model_mm: HandModel,  # unbatched generic skeleton
    n_calibration_samples: int = 30,
    min_num_crops: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full two-pass unknown-skeleton protocol for S merged sequences
    (run_eval_unknown_skeleton.py:49-128): batched scale calibration on
    2-view frames, then batched known-skeleton retracking with each
    sequence's calibrated generic skeleton.  With the known-path
    ``eval_sequences_batched`` this covers all four protocol cells
    ({known, unknown} x dataset split) at S-way scale.

    Returns (per_sequence_error, per_sequence_valid, global_mean, scales).
    """
    s = rigs.fx.shape[0]
    scales = calibrate_sequences_batched(
        model, config, variables, rigs, seqs, make_batched_state(model, s),
        hand_models_mm, n_calibration_samples,
    )  # [S]
    generic_b = jax.tree_util.tree_map(
        lambda a: None if a is None else jnp.broadcast_to(a, (s, *a.shape)),
        generic_hand_model_mm,
    )
    calibrated = scaled_hand_model(generic_b, scales)
    per_seq, n_valid, global_mean = eval_sequences_batched(
        model, config, variables, rigs, seqs, make_batched_state(model, s),
        hand_models_mm, min_num_crops,
        skel_hand_models_mm=calibrated, lm_hand_models_mm=calibrated,
    )
    return per_seq, n_valid, global_mean, scales


def shard_eval_inputs(mesh: Mesh, rigs, seqs, init_state, hand_models):
    """Place eval inputs: S-leading leaves shard over ``data``; the [2S]
    state rows shard over ``data`` as well (rows 2i, 2i+1 live with seq i)."""

    def shard_leading(tree):
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(
                a,
                NamedSharding(mesh, P(*(["data"] + [None] * (a.ndim - 1)))),
            ),
            tree,
        )

    return (
        shard_leading(rigs),
        shard_leading(seqs),
        shard_leading(init_state),
        shard_leading(hand_models),
    )

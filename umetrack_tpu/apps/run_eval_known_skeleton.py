"""Known-skeleton raw_data evaluation (the primary benchmark protocol).

Reproduces the reference ``run_eval_known_skeleton.py``: for every testing
``*.mp4`` + ``*.json`` sequence, generate crop cameras from the GT pose
(min 1 crop), track with the temporal model using the per-user calibrated
skeleton, and pickle per-sequence artifacts for ``load_eval`` aggregation.

TPU-first: the reference forks a pool of 8 processes each rebuilding the
model; here one process drives the chip, a sequence is one ``lax.scan`` and
host threads prefetch/decode the next sequences while the device tracks the
current one.  ``--synthetic N`` runs on generated sequences when
UmeTrack_data is unavailable.
"""
from __future__ import annotations

import argparse
import logging

import numpy as np

from ..data import fs
from ..tracker import HandTracker
from .sequence_eval import (
    eval_sequence_known,
    eval_sequence_known_streaming,
    find_input_output_files,
    save_artifact,
    sequence_mean_error,
)

logger = logging.getLogger(__name__)


def load_model(checkpoint: str | None, dtype: str = "auto"):
    from .common import load_model_cli

    return load_model_cli(checkpoint, dtype)


def run_real(args, tracker: HandTracker):
    from ..tracker.video import open_sequence
    from ..utils.profiling import PhaseTimers

    inputs, outputs = find_input_output_files(
        args.input_dir, args.output_dir, test_only=not args.all_splits
    )
    # Shard sequences across hosts (replaces the reference's Pool(8) +
    # per-sequence fork; decode is host-local, tracking is on-device).
    inputs = inputs[args.rank:: args.world_size]
    outputs = outputs[args.rank:: args.world_size]

    todo = [
        (i, o) for i, o in zip(inputs, outputs)
        if args.override or not fs.exists(o)
    ]
    logger.info("%d sequences to process", len(todo))

    timers = PhaseTimers()
    errors = []
    for in_path, out_path in todo:
        logger.info("Processing %s ...", in_path)
        # Streaming: labels load up front (small), video decodes in bounded
        # chunks overlapped with on-device tracking.
        stream = open_sequence(in_path)
        artifact = eval_sequence_known_streaming(
            tracker, stream, chunk=args.chunk, timers=timers
        )
        save_artifact(out_path, artifact)
        err = sequence_mean_error(artifact)
        errors.append(err)
        logger.info("%s: mean error %.3f mm -> %s", in_path, err, out_path)
    if errors:
        logger.info("Final mean error: %.4f mm", float(np.nanmean(errors)))
        logger.info("phase breakdown:\n%s", timers.report())
    return errors


def synthetic_scale(i: int, jitter: float) -> float | None:
    """Deterministic per-sequence GT hand scale (None when jitter is 0)."""
    if not jitter:
        return None
    return float(np.random.default_rng(123 + i).uniform(1 - jitter, 1 + jitter))


def run_synthetic(args, tracker: HandTracker):
    from ..utils import synthetic

    errors = []
    for i in range(args.synthetic):
        labels, images = synthetic.make_labels_dict(
            args.synthetic_frames, rng_seed=args.seed_base + i,
            mode=args.synthetic_mode,
            hand_scale=synthetic_scale(
                args.seed_base + i, args.synthetic_scale_jitter
            ),
        )
        rig, obs_seq, hand = synthetic.our_sequence(labels, images)
        from ..tracker.video import SequenceData

        seq = SequenceData(
            images=np.asarray(obs_seq.images),
            T_world_from_camera=np.asarray(obs_seq.T_world_from_camera),
            gt_joint_angles=np.asarray(obs_seq.gt_joint_angles),
            gt_wrist_xfs=np.asarray(obs_seq.gt_wrist_xfs),
            gt_confidences=np.asarray(obs_seq.gt_confidences),
            rig=rig,
            hand_model_mm=hand,
            n_frames=len(np.asarray(obs_seq.images)),
        )
        artifact = eval_sequence_known(tracker, seq)
        out_path = fs.join(args.output_dir, "synthetic", f"seq_{i:04d}.npy")
        save_artifact(out_path, artifact)
        err = sequence_mean_error(artifact)
        errors.append(err)
        logger.info("synthetic seq %d: mean error %.3f mm", i, err)
    if errors:
        logger.info("Final mean error: %.4f mm", float(np.nanmean(errors)))
    return errors


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input-dir", default=None,
                        help="UmeTrack_data/raw_data/real root")
    parser.add_argument("--output-dir", required=True)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--override", action="store_true")
    parser.add_argument("--all-splits", action="store_true",
                        help="also process non-'testing' folders")
    parser.add_argument("--rank", type=int, default=0)
    parser.add_argument("--world-size", type=int, default=1)
    parser.add_argument("--chunk", type=int, default=64,
                        help="streaming decode/track chunk length (frames)")
    parser.add_argument("--synthetic", type=int, default=0,
                        help="run N synthetic sequences instead of raw_data")
    parser.add_argument("--synthetic-frames", type=int, default=64)
    parser.add_argument("--synthetic-mode", default="separate",
                        choices=["separate", "hand_hand"],
                        help="separate or interacting/occluding hands "
                        "(the two reference protocols, load_eval.py:92-105)")
    parser.add_argument("--synthetic-scale-jitter", type=float, default=0.15,
                        help="per-sequence GT hand scale ~U[1-j, 1+j]; 0 "
                        "disables")
    # Seed bands (ADVICE r3): corpus training seeds are [0, n_train),
    # corpus test 50_000+, tracker fine-tune 5_000+; eval draws from a
    # reserved band disjoint from every training seed so held-out means
    # held-out on the motion axis too.
    parser.add_argument("--seed-base", type=int, default=1_000_000,
                        help="first rng seed for synthetic eval sequences "
                        "(reserved band, disjoint from all training seeds)")
    from .common import add_runtime_flags, setup_runtime, tracker_config_from_args

    add_runtime_flags(parser)
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    args.rank, args.world_size = setup_runtime(args)
    model, variables = load_model(args.checkpoint, args.dtype)
    tracker = HandTracker(model, variables, tracker_config_from_args(args))

    if args.synthetic:
        run_synthetic(args, tracker)
    else:
        assert args.input_dir, "--input-dir required without --synthetic"
        run_real(args, tracker)


if __name__ == "__main__":
    main()

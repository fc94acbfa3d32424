"""Unknown-skeleton raw_data evaluation (online scale calibration).

Reproduces the reference ``run_eval_unknown_skeleton.py``: pass 1 tracks
with the scale-prediction head on 2-view frames and averages the first N
predicted scales; the generic skeleton scaled by that mean is then used to
retrack the sequence with the known-skeleton protocol (crop cameras still
come from the GT skeleton).  Per-sequence pickles feed ``load_eval``.
"""
from __future__ import annotations

import argparse
import logging
import os

import numpy as np

from ..data import fs
from ..kinematics.hand import load_hand_model_json
from ..tracker import HandTracker
from .run_eval_known_skeleton import load_model
from .sequence_eval import (
    eval_sequence_unknown,
    eval_sequence_unknown_streaming,
    find_input_output_files,
    save_artifact,
    sequence_mean_error,
)

logger = logging.getLogger(__name__)

# Vendored data asset (the reference's dataset/generic_hand_model.json).
DEFAULT_GENERIC_HAND = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "assets", "generic_hand_model.json",
)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input-dir", default=None)
    parser.add_argument("--output-dir", required=True)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--generic-hand-model", default=DEFAULT_GENERIC_HAND)
    parser.add_argument("--n-calibration-samples", type=int, default=30)
    parser.add_argument("--override", action="store_true")
    parser.add_argument("--rank", type=int, default=0)
    parser.add_argument("--world-size", type=int, default=1)
    parser.add_argument("--chunk", type=int, default=64,
                        help="streaming decode/track chunk length (frames)")
    parser.add_argument("--synthetic", type=int, default=0)
    parser.add_argument("--synthetic-frames", type=int, default=64)
    parser.add_argument("--synthetic-mode", default="separate",
                        choices=["separate", "hand_hand"])
    parser.add_argument("--synthetic-scale-jitter", type=float, default=0.15)
    # Seed bands (ADVICE r3): the corpus trains on seeds [0, n_train) and
    # tests on 50_000+, tracker fine-tune draws 5_000+; eval must come from
    # a band none of them touch or the GT motion trajectories are
    # bit-identical to training ones.
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
    generic = load_hand_model_json(args.generic_hand_model)

    errors = []
    if args.synthetic:
        from ..tracker.video import SequenceData
        from ..utils import synthetic

        from .run_eval_known_skeleton import synthetic_scale

        for i in range(args.synthetic):
            labels, images = synthetic.make_labels_dict(
                args.synthetic_frames, rng_seed=args.seed_base + i,
                mode=args.synthetic_mode,
                hand_scale=synthetic_scale(
                    args.seed_base + i, args.synthetic_scale_jitter
                ),
            )
            rig, obs_seq, hand = synthetic.our_sequence(labels, images)
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
            artifact = eval_sequence_unknown(
                tracker, seq, generic, args.n_calibration_samples
            )
            out_path = fs.join(args.output_dir, "synthetic", f"seq_{i:04d}.npy")
            save_artifact(out_path, artifact)
            err = sequence_mean_error(artifact)
            errors.append(err)
            logger.info("synthetic seq %d: mean error %.3f mm", i, err)
    else:
        assert args.input_dir, "--input-dir required without --synthetic"
        from ..tracker.video import open_sequence

        inputs, outputs = find_input_output_files(
            args.input_dir, args.output_dir
        )
        inputs = inputs[args.rank:: args.world_size]
        outputs = outputs[args.rank:: args.world_size]
        todo = [
            (i, o) for i, o in zip(inputs, outputs)
            if args.override or not fs.exists(o)
        ]
        logger.info("%d sequences to process", len(todo))
        for in_path, out_path in todo:
            logger.info("Processing %s ...", in_path)
            # Streaming two-pass protocol: bounded-memory decode per pass
            # (the reference likewise decodes the sequence twice).
            stream = open_sequence(in_path)
            artifact = eval_sequence_unknown_streaming(
                tracker, stream, generic, args.n_calibration_samples,
                chunk=args.chunk,
            )
            save_artifact(out_path, artifact)
            err = sequence_mean_error(artifact)
            errors.append(err)
            logger.info("%s: mean error %.3f mm", in_path, err)

    if errors:
        logger.info("Final mean error: %.4f mm", float(np.nanmean(errors)))


if __name__ == "__main__":
    main()

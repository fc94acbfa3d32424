"""Accuracy regression gate: the committed trained checkpoint must track a
held-out rendered synthetic sequence at least as well as the run that
produced it (GATE_MM, known-skeleton separate-hand protocol — the round-4
device-resident run measures ~26.7 mm on this sequence).

The BASELINE.md north star is <= 10.0 mm; round 4 took the four-cell
protocol from ~62 to ~38 mm (RESULTS.md has the trajectory and the error
decomposition — the remaining gap is angle generalization).  This gate
pins the achieved level so checkpoint regressions fail
loudly; tighten it as training improves.

The checkpoint is produced by ``scripts/accuracy_loop.py``.  The gate
sequence seed is far outside the training corpus' seed range and the eval
app's seeds, so this is genuinely held-out data.
"""
import os

import numpy as np
import pytest

CKPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "checkpoints", "synthetic.msgpack",
)

# Ratcheted every time training improves (VERDICT r3): round-3 ~68 mm at a
# 75 mm gate; round-4 checkpoint measures 26.7 mm on this sequence -> gate
# 32 (1.2x). North star 10.0 (BASELINE.md).
GATE_MM = 32.0
# Seed allocation (single source of truth, ADVICE r3): corpus training
# draws seeds [0, n_train), corpus testing 50_000+, tracker-domain
# fine-tune 5_000+, this gate 901 (inside no band above — n_train <= 512
# in every committed corpus), eval apps 1_000_000+ (reserved eval band,
# --seed-base).
GATE_SEED = 901
# The gate must render with the style the committed checkpoint was trained
# on; flipped to the capsule renderer together with the retrained round-5
# checkpoint (see utils/synthetic.DEFAULT_RENDER_STYLE).
RENDER_STYLE = "strokes"


@pytest.mark.skipif(
    not os.path.exists(CKPT),
    reason="trained checkpoint not present (run scripts/accuracy_loop.py)",
)
def test_known_skeleton_mpjpe_gate():
    import jax

    from umetrack_tpu.models import init_model
    from umetrack_tpu.tracker import HandTracker, sequence_landmarks
    from umetrack_tpu.utils import synthetic
    from umetrack_tpu.utils.checkpoints import load_checkpoint

    model, variables = init_model(jax.random.PRNGKey(0))
    variables = load_checkpoint(CKPT, variables)

    labels, images = synthetic.make_labels_dict(
        32, rng_seed=GATE_SEED, hand_scale=1.07, render_style=RENDER_STYLE
    )
    rig, seq, hand = synthetic.our_sequence(labels, images)

    tracker = HandTracker(model, variables)
    results, _ = tracker.track_sequence(rig, seq, hand)

    tracked_lm = np.asarray(
        sequence_landmarks(hand, results.joint_angles, results.wrist_xfs)
    )
    gt_lm = np.asarray(
        sequence_landmarks(hand, seq.gt_joint_angles, seq.gt_wrist_xfs)
    )
    valid = np.asarray(results.valid)  # [T, 2]

    err = np.linalg.norm(tracked_lm - gt_lm, axis=-1).mean(axis=-1)  # [T, 2]
    mpjpe = float(err[valid].mean())
    assert valid.any()
    assert mpjpe <= GATE_MM, f"MPJPE {mpjpe:.2f} mm exceeds gate {GATE_MM} mm"

"""hand_hand protocol stress tests (VERDICT r2 item 8): interacting,
mutually-occluding hands sharing view cones, plus visibility-count edge
cases around the ``min_required_vis_landmarks`` threshold
(reference perspective_crop.py:54-86, load_eval.py:92-105)."""
import numpy as np
import pytest

import synthetic
from umetrack_tpu.tracker import HandTracker, TrackerConfig, gen_crop_set
from umetrack_tpu.models import make_model

T_FRAMES = 10


@pytest.fixture(scope="module")
def hh_data(reference):
    labels, images = synthetic.make_labels_dict(
        T_FRAMES, rng_seed=11, mode="hand_hand"
    )
    return labels, images


@pytest.fixture(scope="module")
def ref_tracker(reference, torch_model):
    from lib.tracker.tracker import HandTracker as RefTracker, HandTrackerOpts

    return RefTracker(torch_model, HandTrackerOpts())


def _ref_hand_model(labels):
    import torch
    from lib.common.hand import HandModel as RefHandModel

    return RefHandModel(
        **{
            k: torch.Tensor(v) if isinstance(v, list) else v
            for k, v in labels["hand_model"].items()
        }
    )


def _compare_crop_sets(labels, images, frames, min_num_crops, ref_tracker):
    """Our dense masked crop generation vs the reference's dict-of-crops on
    every requested frame of an interacting-hands sequence."""
    rig, seq, hand = synthetic.our_sequence(labels, images)
    ref_hand = _ref_hand_model(labels)
    ref_frames = list(synthetic.reference_input_frames(labels, images))

    for frame_idx in frames:
        input_frame, gt = ref_frames[frame_idx]
        ref_crops = ref_tracker.gen_crop_cameras(
            [v.camera for v in input_frame.views],
            labels["camera_angles"],
            ref_hand,
            gt,
            min_num_crops=min_num_crops,
        )
        crop_set = gen_crop_set(
            rig,
            seq.T_world_from_camera[frame_idx],
            hand,
            seq.gt_joint_angles[frame_idx],
            seq.gt_wrist_xfs[frame_idx],
            seq.gt_confidences[frame_idx],
            TrackerConfig(),
            min_num_crops=min_num_crops,
        )
        for hand_idx in range(2):
            ref_has = hand_idx in ref_crops
            assert bool(crop_set.hand_valid[hand_idx]) == ref_has, (
                f"frame {frame_idx} hand {hand_idx}: "
                f"ours={bool(crop_set.hand_valid[hand_idx])} ref={ref_has}"
            )
            if not ref_has:
                continue
            ref_cams = ref_crops[hand_idx]
            assert int(crop_set.n_views[hand_idx]) == len(ref_cams), (
                f"frame {frame_idx} hand {hand_idx}"
            )
            for slot, (cam_idx, ref_cam) in enumerate(ref_cams.items()):
                assert int(crop_set.src_cam_idx[hand_idx, slot]) == cam_idx
                np.testing.assert_allclose(
                    np.asarray(crop_set.intrinsics[hand_idx, slot]),
                    ref_cam.uv_to_window_matrix(),
                    rtol=1e-4, atol=1e-3,
                )


def test_hand_hand_crop_parity(reference, hh_data, ref_tracker):
    labels, images = hh_data
    _compare_crop_sets(labels, images, [0, 3, 6, 9], 1, ref_tracker)


def test_hand_hand_crop_parity_two_view(reference, hh_data, ref_tracker):
    _compare_crop_sets(*hh_data, [0, 5], 2, ref_tracker)


@pytest.mark.parametrize("shift_mm", [0.0, 120.0, 260.0, 400.0, 650.0])
def test_visibility_threshold_edge(reference, ref_tracker, shift_mm):
    """Slide hand 1 sideways out of the rig's view cones so the per-camera
    visible-landmark count crosses min_required_vis_landmarks=19; eligibility
    and view counts must match the reference at every stage of the exit."""
    labels, images = synthetic.make_labels_dict(2, rng_seed=13)
    wrists = np.asarray(labels["wrist_transforms"], np.float32)
    wrists[:, 1, 0, 3] += shift_mm
    labels["wrist_transforms"] = wrists.tolist()
    _compare_crop_sets(labels, images, [0, 1], 1, ref_tracker)


def test_hand_hand_tracking_finite(hh_data, flax_variables):
    """The fused tracker tracks an interacting-hands sequence end to end:
    both hands stay valid (no dropout frames lost to overlap) and every
    output is finite."""
    labels, images = hh_data
    rig, seq, hand = synthetic.our_sequence(labels, images)

    tracker = HandTracker(make_model(), flax_variables)
    results, state = tracker.track_sequence(rig, seq, hand)

    valid = np.asarray(results.valid)  # [T, 2]
    conf = np.asarray(seq.gt_confidences) > 0
    np.testing.assert_array_equal(valid, conf)
    assert np.isfinite(np.asarray(results.joint_angles)).all()
    assert np.isfinite(np.asarray(results.wrist_xfs)).all()

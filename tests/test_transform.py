"""torch_data preprocess parity: our on-device crop+resample chain vs. the
reference numpy/torch preprocess on an identical synthetic sequence."""
import numpy as np
import pytest
import jax

import synthetic
from umetrack_tpu.data import transform


def make_torchdata_sample(rng_seed=0, t=3, v=2, h=120, w=160, hand_idx=1):
    """Synthetic raw torch_data sample in the reference msgpack schema
    (pinhole views looking at a hand-sized blob near the origin, mm units)."""
    rng = np.random.default_rng(rng_seed)
    hand_dict = synthetic.make_labels_dict(1, rng_seed)[0]["hand_model"]

    cam_poses = synthetic.make_camera_poses()[:v]  # [V, 4, 4] mm
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


@pytest.mark.parametrize("hand_idx", [0, 1])
def test_preprocess_matches_reference(reference, hand_idx):
    from lib.batched_dataset.data_transform import preprocess as ref_preprocess

    mono, labels = make_torchdata_sample(rng_seed=3, hand_idx=hand_idx)

    ref_input, ref_target = ref_preprocess(
        {"mono": mono.copy(), "labels": labels}, crop_size=(96, 96)
    )

    model_input, target = jax.jit(
        lambda d: transform.preprocess_sequence(d, (96, 96))
    )(transform.parse_raw_buffers(mono, labels))

    np.testing.assert_allclose(
        np.asarray(model_input.intrinsics),
        ref_input.intrinsics.numpy(),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(model_input.extrinsics_xf),
        ref_input.extrinsics_xf.numpy(),
        rtol=1e-3, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(model_input.left_images),
        ref_input.left_images.numpy(),
        atol=2e-3,  # exact bilinear both sides; f32 vs f64 coord rounding
    )
    np.testing.assert_allclose(
        np.asarray(model_input.hand_idx), np.asarray(labels["hand"]), atol=0
    )

    # pose data (meters) + mirrored hand models
    np.testing.assert_allclose(
        np.asarray(model_input.orig_pose_data.wrist_xfs),
        ref_input.orig_pose_data.wrist_xfs.numpy(),
        rtol=1e-5, atol=1e-6,
    )
    ref_left = ref_input.orig_pose_data.left_hand_model
    np.testing.assert_allclose(
        np.asarray(model_input.orig_pose_data.left_hand_model.joint_rest_positions),
        ref_left.joint_rest_positions.numpy()[0],  # seq-expanded in reference
        rtol=1e-5, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(model_input.orig_pose_data.left_hand_model.joint_rotation_axes),
        ref_left.joint_rotation_axes.numpy()[0],
        rtol=1e-5, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(target.solved_wrist_xfs),
        ref_target.preds_targets.wrist_xfs.numpy(),
        rtol=1e-5, atol=1e-6,
    )

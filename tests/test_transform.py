"""torch_data preprocess parity: our on-device crop+resample chain vs. the
reference numpy/torch preprocess on an identical synthetic sequence."""
import numpy as np
import pytest
import jax

import synthetic
from umetrack_tpu.data import transform
from umetrack_tpu.utils.synthetic import make_torchdata_sample


@pytest.mark.parametrize("hand_idx", [0, 1])
def test_preprocess_matches_reference(reference, hand_idx):
    from lib.batched_dataset.data_transform import preprocess as ref_preprocess

    # render=False: smooth-noise images keep the strict per-pixel tolerance
    # meaningful (rendered hard edges amplify f32-vs-f64 sample-coordinate
    # rounding into O(0.1) single-pixel diffs; that case is covered with a
    # quantile tolerance in test_preprocess_rendered_quantile below).
    mono, labels = make_torchdata_sample(rng_seed=3, hand_idx=hand_idx,
                                         render=False)

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


def test_preprocess_rendered_quantile(reference):
    """Rendered (hard-edged) content: the crop chain still matches the
    reference everywhere except isolated edge pixels where f32-vs-f64
    sample-coordinate rounding picks a neighboring texel."""
    from lib.batched_dataset.data_transform import preprocess as ref_preprocess

    mono, labels = make_torchdata_sample(rng_seed=5, hand_idx=1)
    ref_input, _ = ref_preprocess(
        {"mono": mono.copy(), "labels": labels}, crop_size=(96, 96)
    )
    model_input, _ = jax.jit(
        lambda d: transform.preprocess_sequence(d, (96, 96))
    )(transform.parse_raw_buffers(mono, labels))

    diff = np.abs(
        np.asarray(model_input.left_images) - ref_input.left_images.numpy()
    )
    assert np.quantile(diff, 0.999) < 2e-3, np.quantile(diff, 0.999)
    assert diff.mean() < 1e-4, diff.mean()

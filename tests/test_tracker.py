"""End-to-end tracker parity: our fused on-device tracker vs. the reference
HandTracker driven frame-by-frame with the same (converted) weights on the
same synthetic sequence."""
import numpy as np
import pytest
import jax.numpy as jnp

import synthetic
from umetrack_tpu.models import make_model
from umetrack_tpu.tracker import (
    HandTracker,
    TrackerConfig,
    gen_crop_set,
    sequence_landmarks,
)
from umetrack_tpu.kinematics.hand import scaled_hand_model


T_FRAMES = 12


@pytest.fixture(scope="module")
def seq_data(reference):
    labels, images = synthetic.make_labels_dict(T_FRAMES, rng_seed=7)
    return labels, images


@pytest.fixture(scope="module")
def ref_tracker(reference, torch_model):
    from lib.tracker.tracker import HandTracker as RefTracker, HandTrackerOpts

    return RefTracker(torch_model, HandTrackerOpts())


@pytest.fixture(scope="module")
def ref_hand_model(reference, seq_data):
    import torch
    from lib.common.hand import HandModel as RefHandModel

    labels, _ = seq_data
    return RefHandModel(
        **{
            k: torch.Tensor(v) if isinstance(v, list) else v
            for k, v in labels["hand_model"].items()
        }
    )


def _ref_crop_cameras(ref_tracker, ref_hand_model, labels, images, frame_idx,
                      min_num_crops=1):
    frames = list(synthetic.reference_input_frames(labels, images))
    input_frame, gt = frames[frame_idx]
    crop_cameras = ref_tracker.gen_crop_cameras(
        [v.camera for v in input_frame.views],
        labels["camera_angles"],
        ref_hand_model,
        gt,
        min_num_crops=min_num_crops,
    )
    return input_frame, gt, crop_cameras


class TestCropGeneration:
    def test_crop_set_matches_reference(
        self, reference, seq_data, ref_tracker, ref_hand_model
    ):
        labels, images = seq_data
        rig, seq, hand = synthetic.our_sequence(labels, images)

        for frame_idx in [0, 5]:
            _, _, ref_crops = _ref_crop_cameras(
                ref_tracker, ref_hand_model, labels, images, frame_idx
            )
            crop_set = gen_crop_set(
                rig,
                seq.T_world_from_camera[frame_idx],
                hand,
                seq.gt_joint_angles[frame_idx],
                seq.gt_wrist_xfs[frame_idx],
                seq.gt_confidences[frame_idx],
                TrackerConfig(),
                min_num_crops=1,
            )
            for hand_idx in range(2):
                ref_has = hand_idx in ref_crops
                assert bool(crop_set.hand_valid[hand_idx]) == ref_has, (
                    f"frame {frame_idx} hand {hand_idx}"
                )
                if not ref_has:
                    continue
                ref_cams = ref_crops[hand_idx]
                assert int(crop_set.n_views[hand_idx]) == len(ref_cams)
                for slot, (cam_idx, ref_cam) in enumerate(ref_cams.items()):
                    assert int(crop_set.src_cam_idx[hand_idx, slot]) == cam_idx
                    np.testing.assert_allclose(
                        np.asarray(crop_set.intrinsics[hand_idx, slot]),
                        ref_cam.uv_to_window_matrix(),
                        rtol=1e-4,
                        atol=1e-3,
                    )
                    np.testing.assert_allclose(
                        np.asarray(crop_set.T_world_from_eye[hand_idx, slot]),
                        ref_cam.camera_to_world_xf,
                        rtol=1e-3,
                        atol=5e-2,  # mm-scale translations
                    )


class TestSequenceTracking:
    def test_sequence_matches_reference(
        self, reference, seq_data, ref_tracker, ref_hand_model, flax_variables
    ):
        import torch

        labels, images = seq_data
        rig, seq, hand = synthetic.our_sequence(labels, images)

        # --- reference loop (run_eval_known_skeleton.py:68-86)
        ref_angles = np.zeros((T_FRAMES, 2, 22))
        ref_wrists = np.zeros((T_FRAMES, 2, 4, 4))
        ref_valid = np.zeros((T_FRAMES, 2), dtype=bool)
        ref_tracker._model._temporal._mem_features = torch.empty(0)
        ref_tracker._model._temporal._prev_extrinsics = torch.empty(0)
        ref_tracker.reset_history()
        for ti, (input_frame, gt) in enumerate(
            synthetic.reference_input_frames(labels, images)
        ):
            crop_cameras = ref_tracker.gen_crop_cameras(
                [v.camera for v in input_frame.views],
                labels["camera_angles"],
                ref_hand_model,
                gt,
                min_num_crops=1,
            )
            res = ref_tracker.track_frame(input_frame, ref_hand_model, crop_cameras)
            for hand_idx, pose in res.hand_poses.items():
                ref_angles[ti, hand_idx] = pose.joint_angles
                ref_wrists[ti, hand_idx] = pose.wrist_xform
                ref_valid[ti, hand_idx] = True

        # --- ours: one scan over the sequence
        tracker = HandTracker(make_model(), flax_variables)
        results, _ = tracker.track_sequence(rig, seq, hand, min_num_crops=1)

        np.testing.assert_array_equal(np.asarray(results.valid), ref_valid)

        # Measured error budget (CPU, converted weights, 12-frame synthetic
        # sequence): angles max 2.1e-7, rotation max 2.5e-6, wrist
        # translation max 2.1e-4 mm / p99 1.9e-4 mm.  Tolerances are ~50x
        # the measured max — far inside BASELINE.md's 0.5 mm parity budget.
        v = ref_valid
        np.testing.assert_allclose(
            np.asarray(results.joint_angles)[v], ref_angles[v], atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(results.wrist_xfs)[v][..., :3, :3],
            ref_wrists[v][..., :3, :3],
            atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(results.wrist_xfs)[v][..., :3, 3],
            ref_wrists[v][..., :3, 3],
            atol=0.01,  # mm
        )

        # dropout frames for hand 1 must be invalid
        lo = T_FRAMES // 3
        assert not ref_valid[lo, 1] and not np.asarray(results.valid)[lo, 1]

        # landmarks pipeline shape check
        lm = sequence_landmarks(
            hand, results.joint_angles, results.wrist_xfs
        )
        assert lm.shape == (T_FRAMES, 2, 21, 3)
        assert bool(jnp.all(jnp.isfinite(lm)))

    def test_calibration_matches_reference(
        self, reference, seq_data, ref_tracker, ref_hand_model, flax_variables
    ):
        import torch
        from lib.tracker.tracker import HandTrackerOpts

        labels, images = seq_data
        rig, seq, hand = synthetic.our_sequence(labels, images)

        ref_tracker._model._temporal._mem_features = torch.empty(0)
        ref_tracker._model._temporal._prev_extrinsics = torch.empty(0)
        ref_tracker.reset_history()
        scale_samples = []
        n_cal = 10
        for ti, (input_frame, gt) in enumerate(
            synthetic.reference_input_frames(labels, images)
        ):
            crop_cameras = ref_tracker.gen_crop_cameras(
                [v.camera for v in input_frame.views],
                labels["camera_angles"],
                ref_hand_model,
                gt,
                min_num_crops=2,
            )
            res = ref_tracker.track_frame_and_calibrate_scale(
                input_frame, crop_cameras
            )
            for hand_idx in res.hand_poses.keys():
                scale_samples.append(res.predicted_scales[hand_idx])
            if len(scale_samples) >= n_cal:
                scale_samples = scale_samples[:n_cal]
                break
        ref_scale = float(np.mean(scale_samples))

        tracker = HandTracker(make_model(), flax_variables)
        our_scale = float(
            tracker.calibrate_sequence(rig, seq, hand, n_calibration_samples=n_cal)
        )
        np.testing.assert_allclose(our_scale, ref_scale, atol=2e-3)

        scaled = scaled_hand_model(hand, our_scale)
        assert np.isfinite(np.asarray(scaled.joint_rest_positions)).all()


class TestStreamingVsScanEquivalence:
    """The streaming carry path (track_frame) and the hoisted-scan path
    (track_sequence) claim the same reference semantics
    (/root/reference/lib/models/temporal.py:93-139); this pins the two code
    paths together so they cannot drift (round-2 advisor ask).

    Both heads, f32 and bf16, on a rendered synthetic sequence with a
    confidence dropout (so use_memory toggles mid-sequence).
    """

    @pytest.fixture(scope="class")
    def eq_data(self):
        labels, images = synthetic.make_labels_dict(6, rng_seed=11)
        return synthetic.our_sequence(labels, images)

    @pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
    def test_track_frame_equals_scan(self, eq_data, dtype):
        import jax
        from umetrack_tpu.models import init_model
        from umetrack_tpu.models.config import ModelConfig
        from umetrack_tpu.tracker.types import FrameObservation

        rig, seq, hand = eq_data
        model, variables = init_model(
            jax.random.PRNGKey(2), ModelConfig(compute_dtype=dtype)
        )
        tracker = HandTracker(model, variables)

        # scan path over the whole sequence
        res_scan, state_scan = tracker.track_sequence(rig, seq, hand)

        # streaming path: track_frame per frame, threading the carry
        state = tracker.init_state()
        angles, wrists, valids, scales = [], [], [], []
        t = int(np.asarray(seq.images).shape[0])
        for ti in range(t):
            obs = jax.tree_util.tree_map(lambda a: a[ti], seq)
            res, state = tracker.track_frame(rig, obs, state, hand)
            angles.append(np.asarray(res.joint_angles))
            wrists.append(np.asarray(res.wrist_xfs))
            valids.append(np.asarray(res.valid))

        # bf16: both paths run the identical bf16 graph modulo batching of
        # the backbone (T*B vs B rows) — BN reductions batch differently, so
        # allow bf16-epsilon-scale slack; f32 must agree to fused-add slack.
        # f32: reduction order differs between the T*B-batched backbone
        # and the per-frame one (measured max diff 1.3e-5 rad) — allow 1e-4,
        # still ~3 orders below any semantic drift.
        atol_a = 1e-4 if dtype == "float32" else 2e-2
        atol_w = 0.02 if dtype == "float32" else 2.0  # mm
        np.testing.assert_array_equal(
            np.stack(valids), np.asarray(res_scan.valid)
        )
        v = np.stack(valids)
        np.testing.assert_allclose(
            np.stack(angles)[v], np.asarray(res_scan.joint_angles)[v],
            atol=atol_a,
        )
        np.testing.assert_allclose(
            np.stack(wrists)[v][..., :3, 3],
            np.asarray(res_scan.wrist_xfs)[v][..., :3, 3],
            atol=atol_w,
        )

        # T=1 scan == first streaming step (same zero state on both sides)
        seq1 = jax.tree_util.tree_map(lambda a: a[:1], seq)
        res1, state1 = tracker.track_sequence(rig, seq1, hand)
        np.testing.assert_allclose(
            np.asarray(res1.joint_angles)[0][valids[0]],
            angles[0][valids[0]], atol=atol_a,
        )
        np.testing.assert_allclose(
            np.asarray(res1.wrist_xfs)[0][valids[0]][..., :3, 3],
            wrists[0][valids[0]][..., :3, 3], atol=atol_w,
        )

    def test_scale_head_streaming_equals_scan(self, eq_data):
        import jax
        from umetrack_tpu.models import init_model
        from umetrack_tpu.models.config import ModelConfig

        rig, seq, hand = eq_data
        model, variables = init_model(jax.random.PRNGKey(3), ModelConfig())
        tracker = HandTracker(model, variables)

        scales_scan, valid_scan, _ = tracker.predict_scales(rig, seq, hand)

        state = tracker.init_state()
        t = int(np.asarray(seq.images).shape[0])
        for ti in range(t):
            obs = jax.tree_util.tree_map(lambda a: a[ti], seq)
            res, state = tracker.track_frame_and_calibrate_scale(
                rig, obs, state, hand
            )
            if bool(np.asarray(res.valid).any()):
                np.testing.assert_allclose(
                    np.asarray(res.predicted_scales)[np.asarray(res.valid)],
                    np.asarray(scales_scan[ti])[np.asarray(valid_scan[ti])],
                    atol=1e-5,
                )


class TestPoolSamplerEquivalence:
    """The image-pool warp kernel (TrackerConfig.sampler='pallas_pool', the
    TPU default) must produce the same tracks as the per-warp gather
    sampler through every sequence entry point (interpret mode on CPU)."""

    @pytest.fixture(scope="class")
    def pool_data(self):
        labels, images = synthetic.make_labels_dict(4, rng_seed=13)
        return synthetic.our_sequence(labels, images)

    def test_track_sequence_pool_matches_gather(self, pool_data):
        import jax
        from umetrack_tpu.models import init_model
        from umetrack_tpu.tracker.types import TrackerConfig

        rig, seq, hand = pool_data
        model, variables = init_model(jax.random.PRNGKey(5))

        res_g, _ = HandTracker(
            model, variables, TrackerConfig(sampler="gather1d")
        ).track_sequence(rig, seq, hand)
        res_p, _ = HandTracker(
            model, variables, TrackerConfig(sampler="pallas_pool")
        ).track_sequence(rig, seq, hand)

        np.testing.assert_array_equal(
            np.asarray(res_p.valid), np.asarray(res_g.valid)
        )
        v = np.asarray(res_g.valid)
        # the kernel's f32 row/column picks vs the gather's x64-promoted
        # lerp: sub-1e-3-rad / sub-0.1-mm agreement expected
        np.testing.assert_allclose(
            np.asarray(res_p.joint_angles)[v],
            np.asarray(res_g.joint_angles)[v], atol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(res_p.wrist_xfs)[v][..., :3, 3],
            np.asarray(res_g.wrist_xfs)[v][..., :3, 3], atol=0.1,
        )

    def test_batched_pool_matches_gather(self, pool_data):
        import jax
        from umetrack_tpu.models import init_model
        from umetrack_tpu.tracker.types import TrackerConfig, TrackState
        from umetrack_tpu.models.umetrack import TemporalState
        from umetrack_tpu.tracker.tracker import track_sequences_batched

        rig, seq, hand = pool_data
        model, variables = init_model(jax.random.PRNGKey(5))

        def stack2(tree):
            return jax.tree_util.tree_map(
                lambda a: None if a is None else jnp.stack([a, a]), tree
            )

        rigs, seqs, hands = stack2(rig), stack2(seq), stack2(hand)
        init = TrackState(
            temporal=TemporalState.zeros(4, model.config),
            valid_history=jnp.zeros((4,), bool),
        )
        outs = {}
        for name in ("gather1d", "pallas_pool"):
            res, _ = track_sequences_batched(
                model, TrackerConfig(sampler=name), variables,
                rigs, seqs, init, hands,
            )
            outs[name] = res
        v = np.asarray(outs["gather1d"].valid)
        np.testing.assert_array_equal(
            np.asarray(outs["pallas_pool"].valid), v
        )
        np.testing.assert_allclose(
            np.asarray(outs["pallas_pool"].joint_angles)[v],
            np.asarray(outs["gather1d"].joint_angles)[v], atol=1e-3,
        )

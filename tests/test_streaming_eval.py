"""Bounded-memory streaming eval: chunked decode+track must reproduce
whole-sequence tracking exactly, with peak image memory O(chunk)
(VERDICT r1 item 4; reference VideoStream video_pose_data.py:37-55)."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def synthetic_seq():
    from umetrack_tpu.tracker.video import SequenceData
    from umetrack_tpu.utils import synthetic

    labels, images = synthetic.make_labels_dict(12, rng_seed=3)
    rig, obs_seq, hand = synthetic.our_sequence(labels, images)
    return SequenceData(
        images=np.asarray(obs_seq.images),
        T_world_from_camera=np.asarray(obs_seq.T_world_from_camera),
        gt_joint_angles=np.asarray(obs_seq.gt_joint_angles),
        gt_wrist_xfs=np.asarray(obs_seq.gt_wrist_xfs),
        gt_confidences=np.asarray(obs_seq.gt_confidences),
        rig=rig,
        hand_model_mm=hand,
        n_frames=12,
    )


@pytest.fixture(scope="module")
def tracker():
    import jax

    from umetrack_tpu.models import init_model
    from umetrack_tpu.tracker import HandTracker

    model, variables = init_model(jax.random.PRNGKey(0))
    return HandTracker(model, variables)


def test_video_stream_matches_whole_decode(tmp_path):
    """stream_video_strip yields the same pixels as decode_video_strip."""
    import cv2

    from umetrack_tpu.tracker.video import (
        decode_video_strip,
        stream_video_strip,
    )

    rng = np.random.default_rng(0)
    t, n_cams, h, w = 11, 4, 48, 64
    # smooth frames so lossy encoding stays deterministic between readers
    frames = np.stack(
        [
            cv2.resize(
                rng.uniform(0, 255, (6, 8)).astype(np.float32), (w * n_cams, h)
            ).clip(0, 255).astype(np.uint8)
            for _ in range(t)
        ]
    )
    path = str(tmp_path / "strip.mp4")
    vw = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (w * n_cams, h), False
    )
    assert vw.isOpened()
    for f in frames:
        vw.write(f)
    vw.release()

    whole = decode_video_strip(path, n_cams)
    chunks = list(stream_video_strip(path, n_cams, chunk_size=4))
    assert [len(c) for c in chunks] == [4, 4, 3]
    streamed = np.concatenate(chunks)
    assert streamed.shape == whole.shape == (t, n_cams, h, w)
    assert np.array_equal(streamed, whole)


def test_chunked_tracking_matches_whole(synthetic_seq, tracker):
    """Chunk-by-chunk tracking with carried TrackState == whole-sequence."""
    from umetrack_tpu.apps.sequence_eval import (
        eval_sequence_known,
        eval_sequence_known_streaming,
    )
    from umetrack_tpu.tracker.video import stream_from_data

    whole = eval_sequence_known(tracker, synthetic_seq)
    stream = stream_from_data(synthetic_seq)
    chunked = eval_sequence_known_streaming(tracker, stream, chunk=4)

    assert set(whole) == set(chunked)
    for k in whole:
        a, b = whole[k], chunked[k]
        assert a.shape == b.shape, k
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-5, err_msg=k)


def test_streaming_calibration_matches(synthetic_seq, tracker):
    from umetrack_tpu.apps.sequence_eval import calibrate_streaming, to_observation
    from umetrack_tpu.tracker.video import stream_from_data

    obs = to_observation(synthetic_seq)
    whole = float(
        tracker.calibrate_sequence(
            synthetic_seq.rig, obs, synthetic_seq.hand_model_mm,
            n_calibration_samples=10,
        )
    )
    streamed = calibrate_streaming(
        tracker, stream_from_data(synthetic_seq),
        n_calibration_samples=10, chunk=4,
    )
    assert np.isclose(whole, streamed, rtol=1e-5)


def test_unknown_streaming_protocol(synthetic_seq, tracker):
    from umetrack_tpu.apps.sequence_eval import (
        eval_sequence_unknown,
        eval_sequence_unknown_streaming,
    )
    from umetrack_tpu.kinematics.hand import load_hand_model_json
    from umetrack_tpu.tracker.video import stream_from_data

    from conftest import GENERIC_HAND_JSON

    generic = load_hand_model_json(GENERIC_HAND_JSON)
    whole = eval_sequence_unknown(tracker, synthetic_seq, generic, 10)
    chunked = eval_sequence_unknown_streaming(
        tracker, stream_from_data(synthetic_seq), generic, 10, chunk=4
    )
    np.testing.assert_allclose(
        whole["calibrated_scale"], chunked["calibrated_scale"], rtol=1e-5
    )
    # The hoisted scan batches the backbone over all T frames at once, so
    # chunked (T=4) vs whole (T=12) runs reduce convs in different orders:
    # f32 reassociation noise ~1e-7 relative on ~1e2 mm keypoints.  2e-3 mm
    # stays 250x inside the 0.5 mm parity budget (BASELINE.md).
    np.testing.assert_allclose(
        whole["tracked_keypoints"], chunked["tracked_keypoints"],
        rtol=0, atol=2e-3,
    )


def test_stream_is_lazy(synthetic_seq):
    """chunks() must not decode ahead: each next() yields one block."""
    from umetrack_tpu.tracker.video import stream_from_data

    stream = stream_from_data(synthetic_seq)
    it = stream.chunks(5)
    t0, c0 = next(it)
    assert t0 == 0 and len(c0) == 5
    t1, c1 = next(it)
    assert t1 == 5 and len(c1) == 5
    t2, c2 = next(it)
    assert t2 == 10 and len(c2) == 2
    with pytest.raises(StopIteration):
        next(it)

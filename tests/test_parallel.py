"""Mesh/sharding layer: training step + distributed eval on the 8-device
virtual CPU mesh; sharded results must match unsharded."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from umetrack_tpu.models import init_model
from umetrack_tpu.parallel import (
    create_train_state,
    make_mesh,
    shard_batch,
    shard_variables,
    synthetic_train_batch,
    train_step,
)
from umetrack_tpu.parallel.eval import (
    eval_sequences_batched,
    make_batched_state,
    shard_eval_inputs,
)
from umetrack_tpu.kinematics.hand import from_dict
from umetrack_tpu.tracker import TrackerConfig
from umetrack_tpu.utils import synthetic


@pytest.fixture(scope="module")
def model_vars():
    return init_model(jax.random.PRNGKey(0))


def test_mesh_shapes():
    # Default is pure data parallelism (TP measured ~2x slower at this model
    # size — scripts/scaling_bench.py); model_axis=0 auto-picks TP=2 on even
    # device counts for experiments.
    mesh = make_mesh(jax.devices())
    assert mesh.shape["data"] == len(jax.devices())
    assert mesh.shape["model"] == 1
    mesh_tp = make_mesh(jax.devices(), model_axis=0)
    assert mesh_tp.shape["model"] == 2
    assert mesh_tp.shape["data"] * 2 == len(jax.devices())


def test_train_step_sharded_matches_unsharded(model_vars):
    model, variables = model_vars
    hand = from_dict(synthetic.load_generic_hand_dict())
    optimizer = optax.sgd(1e-3)
    batch = synthetic_train_batch(0, 8, hand)

    # unsharded
    ts0 = create_train_state(variables, optimizer)
    _, metrics0 = train_step(model, optimizer, ts0, batch)

    # sharded over 4x2 mesh
    mesh = make_mesh(jax.devices())
    vars_sharded = shard_variables(variables, mesh)
    ts1 = create_train_state(vars_sharded, optimizer)
    batch_sharded = shard_batch(batch, mesh)
    _, metrics1 = train_step(model, optimizer, ts1, batch_sharded)

    np.testing.assert_allclose(
        float(metrics0["loss"]), float(metrics1["loss"]), rtol=1e-5
    )


def test_train_step_decreases_loss(model_vars):
    model, variables = model_vars
    hand = from_dict(synthetic.load_generic_hand_dict())
    optimizer = optax.adam(1e-3)
    ts = create_train_state(variables, optimizer)
    batch = synthetic_train_batch(1, 4, hand)
    losses = []
    for _ in range(5):
        ts, metrics = train_step(model, optimizer, ts, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


@pytest.fixture(scope="module")
def small_sequences():
    s, t = 4, 4
    rigs, seqs, hands = [], [], []
    for i in range(s):
        labels, images = synthetic.make_labels_dict(t, rng_seed=20 + i)
        rig, seq, hand = synthetic.our_sequence(labels, images)
        rigs.append(rig)
        seqs.append(seq)
        hands.append(hand)
    stack = lambda xs: jax.tree_util.tree_map(lambda *a: jnp.stack(a), *xs)
    return stack(rigs), stack(seqs), stack(hands)


def test_distributed_eval_matches_single(model_vars, small_sequences):
    model, variables = model_vars
    rigs, seqs, hands = small_sequences
    cfg = TrackerConfig()
    s = rigs.fx.shape[0]

    state = make_batched_state(model, s)
    err_single, n_valid, mean_single = eval_sequences_batched(
        model, cfg, variables, rigs, seqs, state, hands
    )

    mesh = make_mesh(jax.devices()[:4], model_axis=1)  # data=4
    rigs_s, seqs_s, state_s, hands_s = shard_eval_inputs(
        mesh, rigs, seqs, state, hands
    )
    err_sharded, _, mean_sharded = eval_sequences_batched(
        model, cfg, variables, rigs_s, seqs_s, state_s, hands_s
    )

    np.testing.assert_allclose(
        np.asarray(err_single), np.asarray(err_sharded), rtol=1e-4, atol=1e-3
    )
    np.testing.assert_allclose(
        float(mean_single), float(mean_sharded), rtol=1e-4, atol=1e-3
    )
    assert np.all(np.asarray(n_valid) > 0)


def test_batched_matches_per_sequence_tracking(model_vars, small_sequences):
    """The merged-batch multi-sequence path must reproduce per-sequence
    tracking results exactly (same graph, different batching)."""
    from umetrack_tpu.tracker import HandTracker

    model, variables = model_vars
    rigs, seqs, hands = small_sequences
    cfg = TrackerConfig()
    s = rigs.fx.shape[0]

    state = make_batched_state(model, s)
    from umetrack_tpu.tracker.tracker import track_sequences_batched

    res_b, _ = track_sequences_batched(
        model, cfg, variables, rigs, seqs, state, hands
    )

    tracker = HandTracker(model, variables)
    for i in range(s):
        rig_i = jax.tree_util.tree_map(lambda a: a[i], rigs)
        seq_i = jax.tree_util.tree_map(lambda a: a[i], seqs)
        hand_i = jax.tree_util.tree_map(
            lambda a: None if a is None else a[i], hands
        )
        res_i, _ = tracker.track_sequence(rig_i, seq_i, hand_i)
        np.testing.assert_array_equal(
            np.asarray(res_b.valid)[:, i], np.asarray(res_i.valid)
        )
        np.testing.assert_allclose(
            np.asarray(res_b.joint_angles)[:, i],
            np.asarray(res_i.joint_angles),
            rtol=1e-4, atol=1e-4,
        )


def test_batched_unknown_skeleton_matches_per_sequence(model_vars, small_sequences):
    """calibrate_sequences_batched + the unknown protocol reproduce the
    per-sequence calibrate/track path (VERDICT r1 item 7; reference
    run_eval_unknown_skeleton.py:49-128)."""
    from umetrack_tpu.kinematics.hand import load_hand_model_json, scaled_hand_model
    from umetrack_tpu.parallel.eval import eval_sequences_unknown_batched
    from umetrack_tpu.tracker import HandTracker
    from umetrack_tpu.tracker.tracker import calibrate_sequences_batched

    model, variables = model_vars
    rigs, seqs, hands = small_sequences
    cfg = TrackerConfig()
    s = rigs.fx.shape[0]

    scales_b = calibrate_sequences_batched(
        model, cfg, variables, rigs, seqs, make_batched_state(model, s),
        hands, n_calibration_samples=6,
    )
    assert scales_b.shape == (s,)

    tracker = HandTracker(model, variables)
    for i in range(s):
        rig_i = jax.tree_util.tree_map(lambda a: a[i], rigs)
        seq_i = jax.tree_util.tree_map(lambda a: a[i], seqs)
        hand_i = jax.tree_util.tree_map(
            lambda a: None if a is None else a[i], hands
        )
        scale_i = tracker.calibrate_sequence(
            rig_i, seq_i, hand_i, n_calibration_samples=6
        )
        np.testing.assert_allclose(
            float(scales_b[i]), float(scale_i), rtol=1e-4
        )

    from conftest import GENERIC_HAND_JSON

    generic = load_hand_model_json(GENERIC_HAND_JSON)
    per_seq, n_valid, gmean, scales2 = eval_sequences_unknown_batched(
        model, cfg, variables, rigs, seqs, hands, generic,
        n_calibration_samples=6,
    )
    assert per_seq.shape == (s,)
    np.testing.assert_allclose(
        np.asarray(scales2), np.asarray(scales_b), rtol=1e-5
    )
    assert np.isfinite(float(gmean))

    # spot-check sequence 0 against the per-sequence unknown protocol
    rig0 = jax.tree_util.tree_map(lambda a: a[0], rigs)
    seq0 = jax.tree_util.tree_map(lambda a: a[0], seqs)
    hand0 = jax.tree_util.tree_map(
        lambda a: None if a is None else a[0], hands
    )
    calibrated0 = scaled_hand_model(generic, scales_b[0])
    res0, _ = tracker.track_sequence(
        rig0, seq0, hand0, skel_hand_model_mm=calibrated0
    )
    from umetrack_tpu.tracker import sequence_landmarks

    tracked = sequence_landmarks(calibrated0, res0.joint_angles, res0.wrist_xfs)
    gt = sequence_landmarks(hand0, seq0.gt_joint_angles, seq0.gt_wrist_xfs)
    v = np.asarray(res0.valid).astype(float)
    err = np.linalg.norm(np.asarray(tracked) - np.asarray(gt), axis=-1).mean(-1)
    expected = (err * v).sum() / max(v.sum(), 1.0)
    np.testing.assert_allclose(float(per_seq[0]), expected, rtol=1e-3)


def test_wrist_point_targets_decode_consistently():
    """The GT wrist-point targets in _frame_losses must round-trip through
    the model's own decode chain (Procrustes -> cam0->world -> right-hand
    x-mirror) back to the GT wrist for BOTH hands.  Right-hand crop cameras
    are x-mirrored (det(e0) = -1); without mirroring the GT wrist's x basis
    column first, the targets are a reflected point set whose Procrustes fit
    has the wrong rotation (caught in round 3)."""
    import jax.numpy as jnp

    from umetrack_tpu.data.transform import parse_raw_buffers, preprocess_sequence
    from umetrack_tpu.models.components import gen_rigid_points
    from umetrack_tpu.models.procrustes import procrustes_align
    from umetrack_tpu.models.umetrack import _wrist_to_world
    from umetrack_tpu.utils.synthetic import make_torchdata_sample

    for hand_idx in (0, 1):
        mono, labels = make_torchdata_sample(rng_seed=9, t=2, hand_idx=hand_idx)
        raw = parse_raw_buffers(mono, labels)
        mi, tg = jax.jit(preprocess_sequence)(raw)
        e0 = jnp.asarray(np.asarray(mi.extrinsics_xf)[:, 0])
        gt_w = jnp.asarray(np.asarray(tg.gt_wrist_xfs))
        hands = jnp.full((2,), hand_idx)

        # target construction (as in parallel.train._frame_losses)
        sign = jnp.where(hands == 1, -1.0, 1.0)
        gt_eff = gt_w.at[..., :, 0].multiply(sign[:, None])
        gt_cam0 = e0 @ gt_eff
        rigid = jnp.asarray(gen_rigid_points(7))
        gt_pts = jnp.einsum("tij,pj->tpi", gt_cam0[:, :3, :3], rigid) + gt_cam0[:, None, :3, 3]

        # the model's decode chain applied to the targets
        from_pts = jnp.broadcast_to(rigid, (2, 7, 3))
        wrist_cam0 = procrustes_align(from_pts, gt_pts, "svd")
        back = _wrist_to_world(e0, hands, wrist_cam0)

        np.testing.assert_allclose(
            np.asarray(back), np.asarray(gt_w), rtol=1e-4, atol=1e-5,
        )

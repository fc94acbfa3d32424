"""Device-resident trainer: corpus layout parity with the host batch path,
masked-loss behavior, and a short end-to-end training run (CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import synthetic  # noqa: F401  (path setup)


@pytest.fixture(scope="module")
def entries():
    from umetrack_tpu.apps.train import prepare_tracker_sequences

    return prepare_tracker_sequences(n_seqs=3, t=6, seed0=5000)


@pytest.fixture(scope="module")
def corpus(entries):
    from umetrack_tpu.parallel.resident import build_resident_corpus

    return build_resident_corpus(entries)


def test_gather_matches_host_batch_path(entries, corpus):
    """gather_window must reproduce tracker_domain_batches' rows (same seq
    order, same window) up to the bf16 image storage."""
    from umetrack_tpu.apps.train import tracker_domain_batches
    from umetrack_tpu.parallel.resident import gather_window

    # host path: seqs [0, 1], window starting at t0 (patch the rng draws by
    # requesting a full-size batch with a fixed seed, then mirror its picks)
    it = tracker_domain_batches(entries, seqs_per_batch=2, window=4, seed=7)
    host_batch = next(it)
    rng = np.random.default_rng(7)
    idxs = rng.choice(len(entries), size=2, replace=False)
    t0 = int(rng.integers(0, 6 - 4 + 1))

    dev_batch = gather_window(
        corpus, jnp.asarray(idxs, jnp.int32), jnp.asarray(t0, jnp.int32), 4
    )

    np.testing.assert_allclose(
        np.asarray(dev_batch.frames.images),
        np.asarray(host_batch.frames.images),
        atol=4e-3,  # bf16 image storage
    )
    np.testing.assert_allclose(
        np.asarray(dev_batch.frames.extrinsics),
        np.asarray(host_batch.frames.extrinsics),
        rtol=1e-6, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(dev_batch.gt_joint_angles),
        np.asarray(host_batch.gt_joint_angles),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(dev_batch.gt_wrist_world),
        np.asarray(host_batch.gt_wrist_world),
        rtol=1e-6, atol=1e-7,
    )
    np.testing.assert_array_equal(
        np.asarray(dev_batch.frames.hand_idx)[:, 0], np.tile([0, 1], 2)
    )
    np.testing.assert_allclose(
        np.asarray(dev_batch.gt_scales), np.asarray(host_batch.gt_scales)
    )
    np.testing.assert_allclose(
        np.asarray(dev_batch.skeleton.joint_rest_positions),
        np.asarray(host_batch.skeleton.joint_rest_positions),
        rtol=1e-6,
    )


def test_masked_rows_contribute_nothing(corpus):
    """A row marked invalid must not change the loss regardless of its
    (garbage) supervision targets."""
    from umetrack_tpu.models import init_model
    from umetrack_tpu.parallel.resident import gather_window
    from umetrack_tpu.parallel.train import LossWeights, temporal_loss_fn
    from umetrack_tpu.models import make_model

    model, variables = init_model(jax.random.PRNGKey(0))
    batch = gather_window(
        corpus, jnp.asarray([0, 1], jnp.int32), jnp.asarray(0, jnp.int32), 3
    )
    # mask row 1 entirely, then poison its GT: loss must be unchanged
    valid = np.asarray(batch.valid).copy()
    valid[1, :] = False
    batch_masked = batch.replace(valid=jnp.asarray(valid))
    poisoned = batch_masked.replace(
        gt_joint_angles=batch.gt_joint_angles.at[1].add(100.0),
        gt_wrist_world=batch.gt_wrist_world.at[1, :, :3, 3].add(5.0),
        # scale head too: invalid rows must not leak into the (masked)
        # log-scale MSE either (ADVICE r4)
        gt_scales=batch.gt_scales.at[1].mul(7.0),
    )
    w = LossWeights()
    loss_a = temporal_loss_fn(
        model, variables["params"], variables["batch_stats"], batch_masked, w
    )[0]
    loss_b = temporal_loss_fn(
        model, variables["params"], variables["batch_stats"], poisoned, w
    )[0]
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)


def test_resident_training_learns(corpus):
    from umetrack_tpu.models import init_model
    from umetrack_tpu.parallel.resident import run_resident_training

    model, variables = init_model(jax.random.PRNGKey(1))
    ts, hist = run_resident_training(
        model, variables, corpus, num_steps=8, seqs_per_batch=2, window=3,
        log_every=4, eval_every=8, learning_rate=1e-3, seed=3,
    )
    assert np.isfinite(hist[-1]["loss"])
    assert hist[-1]["loss"] < hist[0]["loss"]
    assert "eval_mpjpe_mm" in hist[-1]
    assert np.isfinite(hist[-1]["eval_mpjpe_mm"])

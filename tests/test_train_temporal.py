"""TBPTT temporal training: gradients reach the memory pathway, loss weights
reach the gradients, and training through time beats single-frame training
at using the memory (VERDICT r1 item 3; reference temporal.py:93-139)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from umetrack_tpu.apps.train import synthetic_batches
from umetrack_tpu.models import init_model
from umetrack_tpu.parallel import (
    LossWeights,
    create_train_state,
    loss_fn,
    temporal_loss_fn,
    temporal_train_step,
)


@pytest.fixture(scope="module")
def model_and_state():
    model, variables = init_model(jax.random.PRNGKey(0))
    opt = optax.adam(1e-4)
    return model, create_train_state(variables, opt), opt


def _mem_channel_grad_norm(grads):
    """Norm of the temporal cell conv0 kernel gradient over the memory input
    channels (0..17: tin = concat([mem, img], -1))."""
    k = grads["temporal"]["conv0"]["kernel"]
    return float(jnp.linalg.norm(k[0, 0, :18, :]))


def test_memory_pathway_gets_gradient_only_through_time(model_and_state):
    """Single-frame training feeds the cell a zero memory => zero gradient on
    the mem-input kernel columns; TBPTT (K>=2) makes them nonzero."""
    model, ts, _ = model_and_state

    tb = next(synthetic_batches(2, (96, 96), window=3))
    g_t = jax.grad(
        lambda p: temporal_loss_fn(model, p, ts.batch_stats, tb)[0]
    )(ts.params)
    assert _mem_channel_grad_norm(g_t) > 1e-8

    sb = next(synthetic_batches(2, (96, 96), window=1))
    g_s = jax.grad(
        lambda p: loss_fn(model, p, ts.batch_stats, sb)[0]
    )(ts.params)
    assert _mem_channel_grad_norm(g_s) < 1e-12


def test_loss_weights_alter_gradients(model_and_state):
    model, ts, _ = model_and_state
    tb = next(synthetic_batches(2, (96, 96), window=2))

    def grads_with(w):
        return jax.grad(
            lambda p: temporal_loss_fn(model, p, ts.batch_stats, tb, w)[0]
        )(ts.params)

    g1 = grads_with(LossWeights(angles=1.0, wrist_points=1.0))
    g2 = grads_with(LossWeights(angles=5.0, wrist_points=0.0))
    k1 = g1["regressor_k"]["conv_out"]["kernel"]
    k2 = g2["regressor_k"]["conv_out"]["kernel"]
    assert not np.allclose(np.asarray(k1), np.asarray(k2))


def test_temporal_training_step_decreases_loss(model_and_state):
    model, ts, opt = model_and_state
    batches = synthetic_batches(2, (96, 96), window=3)
    b = next(batches)
    first = None
    for _ in range(6):
        ts, m = temporal_train_step(model, opt, ts, b, LossWeights())
        if first is None:
            first = float(m["loss"])
    assert np.isfinite(float(m["loss"]))
    assert float(m["loss"]) < first


def test_use_memory_flags_in_window():
    tb = next(synthetic_batches(2, (96, 96), window=3))
    um = np.asarray(tb.frames.use_memory)
    assert um.shape == (2, 3)
    assert not um[:, 0].any()
    assert um[:, 1:].all()


def test_accel_loss_reported_and_reaches_gradients(model_and_state):
    """The smoothness term (VERDICT r4 item 2): reported in metrics for
    windows >= 3, changes the total when weighted, and alters gradients."""
    model, ts, _ = model_and_state
    tb = next(synthetic_batches(2, (96, 96), window=3))

    base, (_, m0) = temporal_loss_fn(
        model, ts.params, ts.batch_stats, tb, LossWeights(accel=0.0)
    )
    assert "accel_loss" in m0
    accel = float(m0["accel_loss"])
    assert np.isfinite(accel) and accel >= 0.0

    with_accel, (_, m1) = temporal_loss_fn(
        model, ts.params, ts.batch_stats, tb, LossWeights(accel=1e3)
    )
    np.testing.assert_allclose(
        float(with_accel), float(base) + 1e3 * accel, rtol=1e-5
    )

    g0 = jax.grad(
        lambda p: temporal_loss_fn(
            model, p, ts.batch_stats, tb, LossWeights(accel=0.0)
        )[0]
    )(ts.params)
    g1 = jax.grad(
        lambda p: temporal_loss_fn(
            model, p, ts.batch_stats, tb, LossWeights(accel=1e4)
        )[0]
    )(ts.params)
    k0 = np.asarray(g0["regressor_k"]["conv_out"]["kernel"])
    k1 = np.asarray(g1["regressor_k"]["conv_out"]["kernel"])
    assert not np.allclose(k0, k1)

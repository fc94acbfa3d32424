"""Ragged-length torch_data batching: different-T sequences in one batch are
edge-padded to a bucket and padded steps are masked out of the error mean,
reproducing the per-sequence errors exactly (VERDICT r1 item 5; reference
collated fixed shapes only, run_inference_torch_data.py:179-185)."""
import jax
import numpy as np
import pytest


@pytest.fixture(scope="module")
def model_and_vars():
    from umetrack_tpu.models import init_model

    return init_model(jax.random.PRNGKey(0))


def _items(lengths):
    from umetrack_tpu.utils.synthetic import make_torchdata_sample

    items = []
    for i, t in enumerate(lengths):
        mono, labels = make_torchdata_sample(rng_seed=i, t=t, hand_idx=i % 2)
        items.append({"mono": mono, "labels": labels})
    return items


def test_ragged_batch_matches_per_sequence(model_and_vars):
    from umetrack_tpu.apps.run_inference_torch_data import _run_batch

    model, variables = model_and_vars
    items = _items([3, 5, 2])

    batched = _run_batch(model, variables, items, (96, 96))
    assert batched.shape == (3,)
    assert np.isfinite(batched).all()

    singles = [
        _run_batch(model, variables, [it], (96, 96))[0] for it in items
    ]
    np.testing.assert_allclose(batched, np.asarray(singles), rtol=0, atol=2e-4)


def test_pad_raw_np_edge_semantics():
    from umetrack_tpu.apps.run_inference_torch_data import _pad_raw_np
    from umetrack_tpu.data.transform import parse_raw_buffers

    items = _items([3])
    raw = jax.device_get(
        parse_raw_buffers(items[0]["mono"], items[0]["labels"])
    )
    padded = _pad_raw_np(raw, 8)
    assert padded.images.shape[0] == 8
    assert np.array_equal(padded.images[3], padded.images[7])
    assert np.array_equal(padded.images[:3], np.asarray(raw.images))
    # non-temporal leaves untouched
    assert padded.hand_model.joint_rotation_axes.shape == (22, 3)

"""Full torch_data eval-path parity: synthetic idx/bin dataset on disk ->
our on-device preprocess+scan eval vs. the reference loader+model loop, with
the same converted weights."""
import numpy as np
import pytest
import jax

import synthetic  # noqa: F401  (path setup)
from umetrack_tpu.utils.synthetic import make_torchdata_sample
from umetrack_tpu.data import Split, write_idxbin
from umetrack_tpu.models import make_model


@pytest.fixture(scope="module")
def torchdata_tree(tmp_path_factory):
    """Two testing sequences of 3 frames each, written as torch_data."""
    root = tmp_path_factory.mktemp("torch_data")
    items = []
    for i, hand_idx in enumerate([0, 1]):
        mono, labels = make_torchdata_sample(rng_seed=10 + i, hand_idx=hand_idx)
        d = root / "real" / f"seq_{i}" / "testing"
        d.mkdir(parents=True)
        write_idxbin(str(d / "mono"), mono[None])  # 1 item = the sequence
        write_idxbin(str(d / "labels"), [labels], msgpack_objects=True)
        items.append((mono, labels))
    return root, items


def test_app_vs_reference(reference, torch_model, flax_variables, torchdata_tree):
    import torch
    from lib.batched_dataset.data_transform import preprocess as ref_preprocess
    from lib.data_utils import bundles as ref_bundles

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_run_inference", "/root/reference/run_inference_torch_data.py"
    )
    ref_run = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_run)

    root, items = torchdata_tree

    # --- reference: preprocess on host, collate, _eval_batch
    ref_samples = [
        ref_preprocess({"mono": m.copy(), "labels": l}, crop_size=(96, 96))
        for m, l in items
    ]
    model_input_ref = ref_bundles.collate([s[0] for s in ref_samples])
    model_target_ref = ref_bundles.collate([s[1] for s in ref_samples])
    torch_model._temporal._mem_features = torch.empty(0)
    torch_model._temporal._prev_extrinsics = torch.empty(0)
    with torch.no_grad():
        ref_err = ref_run._eval_batch(
            torch_model, model_input_ref, model_target_ref,
            "multiv", use_skel=True, device="cpu",
        ).numpy()

    # --- ours: the actual app entry over the on-disk dataset
    from umetrack_tpu.apps.run_inference_torch_data import run

    results = run(
        [str(root)], flax_variables, make_model(), batch_size=2,
    )
    assert Split.TEST in results

    # per-sample comparison through the private batch path
    from umetrack_tpu.apps.run_inference_torch_data import _run_batch
    from umetrack_tpu.data import find_dataset

    ds = find_dataset([str(root)], ["mono", "labels"])[Split.TEST]
    batch_items = [ds[i] for i in range(len(ds))]
    our_err = _run_batch(make_model(), flax_variables, batch_items, (96, 96))

    np.testing.assert_allclose(our_err, ref_err, atol=1.0)  # mm
    np.testing.assert_allclose(results[Split.TEST], ref_err.mean(), atol=1.0)


def test_singlev_mode_vs_reference(reference, torch_model, flax_variables, torchdata_tree):
    import torch
    import importlib.util
    from lib.batched_dataset.data_transform import preprocess as ref_preprocess
    from lib.data_utils import bundles as ref_bundles

    spec = importlib.util.spec_from_file_location(
        "ref_run_inference2", "/root/reference/run_inference_torch_data.py"
    )
    ref_run = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_run)

    root, items = torchdata_tree
    ref_samples = [
        ref_preprocess({"mono": m.copy(), "labels": l}, crop_size=(96, 96))
        for m, l in items
    ]
    model_input_ref = ref_bundles.collate([s[0] for s in ref_samples])
    model_target_ref = ref_bundles.collate([s[1] for s in ref_samples])
    torch_model._temporal._mem_features = torch.empty(0)
    torch_model._temporal._prev_extrinsics = torch.empty(0)
    with torch.no_grad():
        ref_err = ref_run._eval_batch(
            torch_model, model_input_ref, model_target_ref,
            "singlev", use_skel=True, device="cpu",
        ).numpy()

    from umetrack_tpu.apps.run_inference_torch_data import _run_batch
    from umetrack_tpu.data import find_dataset
    from umetrack_tpu.models import make_model

    ds = find_dataset([str(root)], ["mono", "labels"])[Split.TEST]
    batch_items = [ds[i] for i in range(len(ds))]
    our_err = _run_batch(
        make_model(), flax_variables, batch_items, (96, 96), n_views=1
    )
    np.testing.assert_allclose(our_err, ref_err, atol=1.0)

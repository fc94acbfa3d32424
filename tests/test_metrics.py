"""Metric parity vs. the reference metric_utils / load_eval math."""
import os

import numpy as np

from umetrack_tpu import metrics


def test_pck_curve_matches_reference(reference):
    from lib.common import metric_utils as ref

    rng = np.random.default_rng(0)
    errors = rng.uniform(0, 60, size=(100, 2, 21))
    mask = rng.uniform(size=errors.shape) > 0.3

    np.testing.assert_allclose(
        metrics.PCK_curve(errors, metrics.PCK_THRESHOLDS),
        ref.PCK_curve(errors, ref.PCK_THRESHOLDS),
        rtol=1e-9,
    )
    np.testing.assert_allclose(
        metrics.PCK_curve(errors, metrics.PCK_THRESHOLDS, mask=mask, axis=1),
        ref.PCK_curve(errors, ref.PCK_THRESHOLDS, mask=mask, axis=1),
        rtol=1e-9,
    )


def test_auc_matches_reference(reference):
    from lib.common import metric_utils as ref

    rng = np.random.default_rng(1)
    y = np.sort(rng.uniform(0, 100, size=(2, 101)), axis=-1)
    np.testing.assert_allclose(
        metrics.normalized_AUC(metrics.PCK_THRESHOLDS, y, y_max=100.0),
        ref.normalized_AUC(ref.PCK_THRESHOLDS, y, y_max=100.0),
        rtol=1e-9,
    )


def test_sequence_metrics_match_reference(reference):
    import importlib.util

    from conftest import REFERENCE_ROOT

    spec = importlib.util.spec_from_file_location(
        "ref_load_eval", os.path.join(REFERENCE_ROOT, "load_eval.py")
    )
    ref_load_eval = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_load_eval)

    rng = np.random.default_rng(2)
    gt = rng.standard_normal((2, 50, 21, 3)) * 10
    tracked = gt + rng.standard_normal(gt.shape)
    valid = rng.uniform(size=(2, 50)) > 0.2

    ref_m = ref_load_eval._compute_metrics(gt, tracked, valid)
    ours = metrics.compute_sequence_metrics(gt, tracked, valid)

    np.testing.assert_allclose(ours.keypoint_errors, ref_m.keypoint_errors)
    np.testing.assert_allclose(
        ours.keypoint_accelerations, ref_m.keypoint_accelerations
    )
    np.testing.assert_allclose(
        ours.gt_keypoint_accelerations, ref_m.gt_keypoint_accelerations
    )


def test_aggregate_and_mpjpa():
    rng = np.random.default_rng(3)
    gt = rng.standard_normal((2, 30, 21, 3)) * 10
    tracked = gt + 1.0  # each landmark off by |(1,1,1)| -> sqrt(3) mm
    valid = np.ones((2, 30), dtype=bool)
    ga = rng.uniform(-1, 1, size=(2, 30, 22))
    ta = ga + np.deg2rad(2.0)  # 2 degrees off everywhere

    m = metrics.compute_sequence_metrics(gt, tracked, valid, ga, ta)
    agg = metrics.aggregate([m], [valid])
    np.testing.assert_allclose(agg["mpjpe_mm"], np.sqrt(3), rtol=1e-6)
    np.testing.assert_allclose(agg["mpjpa_deg"], 2.0, rtol=1e-5)
    assert agg["success_rate"] == 1.0
    assert 0.9 < agg["pck_auc"] <= 1.0

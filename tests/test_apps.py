"""App-level smoke + protocol tests on synthetic data (CPU)."""
import pickle

import numpy as np
import pytest


def test_known_skeleton_app_and_load_eval(tmp_path, capsys):
    from umetrack_tpu.apps import load_eval, run_eval_known_skeleton

    out_dir = tmp_path / "eval_results_known_skeleton" / "real" / "separate_hand"
    run_eval_known_skeleton.main([
        "--output-dir", str(out_dir),
        "--synthetic", "2",
        "--synthetic-frames", "8",
    ])

    arts = sorted(out_dir.rglob("*.npy"))
    assert len(arts) == 2
    with open(arts[0], "rb") as fp:
        art = pickle.load(fp)
    assert art["tracked_keypoints"].shape == (2, 8, 21, 3)
    assert art["valid_tracking"].shape == (2, 8)
    # the synthetic dropout frames must be invalid for hand 1
    assert not art["valid_tracking"][1, 8 // 3]

    summary = load_eval.main(["--results-root", str(tmp_path)])
    key = "known_skeleton/separate_hand"
    assert key in summary
    assert np.isfinite(summary[key]["mpjpe_mm"])
    assert "mpjpa_deg" in summary[key]
    assert 0 < summary[key]["success_rate"] <= 1.0


def test_unknown_skeleton_app(tmp_path):
    from umetrack_tpu.apps import run_eval_unknown_skeleton

    out_dir = tmp_path / "unknown"
    run_eval_unknown_skeleton.main([
        "--output-dir", str(out_dir),
        "--synthetic", "1",
        "--synthetic-frames", "8",
        "--n-calibration-samples", "5",
    ])
    arts = sorted(out_dir.rglob("*.npy"))
    assert len(arts) == 1
    with open(arts[0], "rb") as fp:
        art = pickle.load(fp)
    assert np.isfinite(art["calibrated_scale"])
    assert art["tracked_keypoints"].shape == (2, 8, 21, 3)


def test_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from umetrack_tpu.models import init_model
    from umetrack_tpu.utils.checkpoints import load_checkpoint, save_checkpoint

    model, variables = init_model(jax.random.PRNGKey(0))

    path = str(tmp_path / "ckpt.msgpack")
    save_checkpoint(path, variables)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, variables)
    restored = load_checkpoint(path, zeros)
    leaves_a = jax.tree_util.tree_leaves(variables)
    leaves_b = jax.tree_util.tree_leaves(restored)
    assert all(
        np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(leaves_a, leaves_b)
    )

    # orbax directory format
    path2 = str(tmp_path / "orbax_ckpt")
    save_checkpoint(path2, variables)
    restored2 = load_checkpoint(path2, zeros)
    leaves_c = jax.tree_util.tree_leaves(restored2)
    assert all(
        np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(leaves_a, leaves_c)
    )

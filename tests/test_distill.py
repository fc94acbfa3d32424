"""Distillation harness (VERDICT r1 item 9): teacher = converted reference
model, student trains on teacher poses; the held-out student-teacher gap
must decline with training and the run must emit the BASELINE.md metric
set."""
import numpy as np


def test_distillation_loop_runs_and_gap_declines(reference):
    from umetrack_tpu.apps.distill import run_distillation

    gaps, final = run_distillation(
        steps=60, batch_size=4, eval_every=15, n_eval_sequences=1,
        learning_rate=1e-4,
    )
    assert len(gaps) >= 4
    assert all(np.isfinite(g) for g in gaps)
    # The student starts at a random-vs-random baseline, swings while the
    # BN statistics settle, then must decline toward the teacher: the last
    # checkpoint beats the post-transient peak.
    assert gaps[-1] < max(gaps[1:-1]), gaps

    # BASELINE.md metric set is emitted
    for key in ("mpjpe_mm", "mpjpa_deg", "pck_auc", "success_rate",
                "mean_keypoint_acceleration"):
        assert key in final, final
        assert np.isfinite(final[key]), (key, final)


def test_teacher_checkpoint_roundtrip(tmp_path, reference):
    """--teacher *.torch loads through the converter (pretrained path)."""
    import torch

    from umetrack_tpu.apps.distill import build_teacher

    v1 = build_teacher(None, seed=3)
    # Save an equivalent torch state dict and reload through the file path.
    import sys

    sys.path.insert(0, "/root/reference")
    from lib.models import model_loader
    from lib.models.model_opts import ModelOpts
    from lib.models import feature_extractor as fe, temporal as tem
    from lib.models import skeleton_encoder as se
    from lib.models.umetrack_model import UmeTrackModel

    torch.manual_seed(3)
    mo = ModelOpts()
    fext = fe.FeatureExtractor((96, 96), mo)
    teacher = UmeTrackModel(
        feature_extractor=fext,
        temporal=tem.create_temporal_model(mo, fext.output_feature_sizes),
        skeleton_encoder=se.SkeletonEncoder(
            [mo.nSkeletonFeatureChannels, *fext.output_feature_sizes]
        ),
        regressor_k=model_loader._create_regressor(
            mo, fext.output_feature_sizes, use_skel=True,
            predict_skel_scale=False,
        ),
        regressor_u=model_loader._create_regressor(
            mo, fext.output_feature_sizes, use_skel=False,
            predict_skel_scale=True,
        ),
    )
    path = str(tmp_path / "teacher.torch")
    torch.save(teacher.state_dict(), path)
    v2 = build_teacher(path)

    import jax

    leaves1 = jax.tree_util.tree_leaves(v1)
    leaves2 = jax.tree_util.tree_leaves(v2)
    assert len(leaves1) == len(leaves2)
    assert all(
        np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(leaves1, leaves2)
    )

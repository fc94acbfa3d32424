#!/usr/bin/env python
"""Benchmark: tracker frames/s per chip on the real device.

Runs the full fused tracker (crop-cam generation -> fisheye warp -> model
forward -> pose decode -> state carry) over a synthetic 4-camera sequence via
lax.scan, and compares against the reference implementation's pipeline
(torch CPU model + numpy/cv2 warps — the reference has no published
throughput numbers, so the baseline is measured on this same host).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
import json
import os
import sys
import time

import numpy as np


def bench_ours(t_frames=16, n_seqs=8, pipeline_depth=4):
    """Amortized batched-tracker throughput on the real chip.

    S sequences are tracked in one merged-batch scan; ``pipeline_depth``
    back-to-back submissions amortize the remote tunnel's per-call latency
    (~30 ms), with a final host fetch as the completion barrier
    (block_until_ready returns at enqueue time on the axon platform).
    """
    import jax
    import jax.numpy as jnp

    from umetrack_tpu.models import init_model
    from umetrack_tpu.models.umetrack import TemporalState
    from umetrack_tpu.tracker import TrackerConfig, TrackState
    from umetrack_tpu.tracker.tracker import track_sequences_batched
    from umetrack_tpu.utils import synthetic

    labels, images = synthetic.make_labels_dict(t_frames, rng_seed=0)
    rig, seq, hand = synthetic.our_sequence(labels, images)

    model, variables = init_model(jax.random.PRNGKey(0))
    cfg = TrackerConfig()

    stack = lambda x: jax.tree_util.tree_map(
        lambda a: jnp.stack([a] * n_seqs), x
    )
    rigs, hands, seqs = stack(rig), stack(hand), stack(seq)  # seqs [S, T, ..]
    state = TrackState(
        temporal=TemporalState.zeros(2 * n_seqs, model.config),
        valid_history=jnp.zeros((2 * n_seqs,), bool),
    )

    def submit(seqs_in):
        res, _ = track_sequences_batched(
            model, cfg, variables, rigs, seqs_in, state, hands
        )
        return res

    res = submit(seqs)
    np.asarray(res.joint_angles)  # warmup incl. compile

    variants = [
        seqs.replace(images=seqs.images + jnp.uint8(i + 1))
        for i in range(pipeline_depth)
    ]
    for v in variants:
        np.asarray(v.images[0, 0, 0, 0, 0])  # materialize inputs

    t0 = time.perf_counter()
    outs = [submit(v) for v in variants]
    for o in outs:
        np.asarray(o.joint_angles)  # completion barrier
    dt = time.perf_counter() - t0
    return (t_frames * n_seqs * pipeline_depth) / dt


def bench_reference_inline(t_frames=8):
    """Reference pipeline on this host (torch CPU + numpy/cv2 warps), same
    synthetic data — the reference publishes no throughput numbers, so this
    measured baseline is the comparison point."""
    import types

    sys.path.insert(0, "/root/reference")
    import torch

    if "pytorch3d" not in sys.modules:
        def so3_exp_map(aa):
            theta = aa.norm(dim=-1)
            theta2 = theta * theta
            small = theta < 1e-6
            a = torch.where(small, 1.0 - theta2 / 6.0,
                            torch.sin(theta) / theta.clamp_min(1e-30))
            b = torch.where(small, 0.5 - theta2 / 24.0,
                            (1.0 - torch.cos(theta)) / theta2.clamp_min(1e-30))
            x, y, z = aa[..., 0], aa[..., 1], aa[..., 2]
            zero = torch.zeros_like(x)
            k = torch.stack([zero, -z, y, z, zero, -x, -y, x, zero], dim=-1)
            k = k.reshape(*aa.shape[:-1], 3, 3)
            eye = torch.eye(3, dtype=aa.dtype, device=aa.device).expand_as(k)
            return eye + a[..., None, None] * k + b[..., None, None] * (k @ k)

        pkg = types.ModuleType("pytorch3d")
        tmod = types.ModuleType("pytorch3d.transforms")
        tmod.so3_exp_map = so3_exp_map
        pkg.transforms = tmod
        sys.modules["pytorch3d"] = pkg
        sys.modules["pytorch3d.transforms"] = tmod

    from lib.models import model_loader
    from lib.models.model_opts import ModelOpts
    from lib.models import feature_extractor as fe, temporal as tem
    from lib.models import skeleton_encoder as se
    from lib.models.umetrack_model import UmeTrackModel
    from lib.tracker.tracker import HandTracker as RefTracker, HandTrackerOpts
    from lib.common.hand import HandModel as RefHandModel

    from umetrack_tpu.utils import synthetic

    torch.manual_seed(0)
    mo = ModelOpts()
    fext = fe.FeatureExtractor((96, 96), mo)
    model = UmeTrackModel(
        feature_extractor=fext,
        temporal=tem.create_temporal_model(mo, fext.output_feature_sizes),
        skeleton_encoder=se.SkeletonEncoder(
            [mo.nSkeletonFeatureChannels, *fext.output_feature_sizes]
        ),
        regressor_k=model_loader._create_regressor(
            mo, fext.output_feature_sizes, use_skel=True, predict_skel_scale=False
        ),
        regressor_u=model_loader._create_regressor(
            mo, fext.output_feature_sizes, use_skel=False, predict_skel_scale=True
        ),
    )
    model.eval()

    labels, images = synthetic.make_labels_dict(t_frames, rng_seed=0,
                                                with_dropout=False)
    hand_model = RefHandModel(
        **{
            k: torch.Tensor(v) if isinstance(v, list) else v
            for k, v in labels["hand_model"].items()
        }
    )
    tracker = RefTracker(model, HandTrackerOpts())

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    from synthetic import reference_input_frames

    frames = list(reference_input_frames(labels, images))
    # warm up one frame (lazy allocs)
    input_frame, gt = frames[0]
    cc = tracker.gen_crop_cameras(
        [v.camera for v in input_frame.views], labels["camera_angles"],
        hand_model, gt, min_num_crops=1,
    )
    tracker.track_frame(input_frame, hand_model, cc)

    t0 = time.perf_counter()
    for input_frame, gt in frames:
        cc = tracker.gen_crop_cameras(
            [v.camera for v in input_frame.views], labels["camera_angles"],
            hand_model, gt, min_num_crops=1,
        )
        tracker.track_frame(input_frame, hand_model, cc)
    dt = time.perf_counter() - t0
    return t_frames / dt


def main():
    ours_fps = bench_ours()
    try:
        ref_fps = bench_reference_inline()
    except Exception as e:  # reference baseline is best-effort
        print(f"reference baseline failed: {e}", file=sys.stderr)
        ref_fps = None

    result = {
        "metric": "tracker_frames_per_s_per_chip",
        "value": round(ours_fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(ours_fps / ref_fps, 2) if ref_fps else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

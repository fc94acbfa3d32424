"""Distillation harness toward accuracy parity (greenfield; the route to the
BASELINE.md targets while the reference's pretrained blob is unavailable).

Teacher: the reference torch model — pretrained weights when a ``--teacher
*.torch`` file is given, else the architecture seeded randomly (the same
construction as model_loader.py:53-76) — converted exactly to flax
(models/convert, parity-tested elsewhere) and run on device.  Student: a
fresh ``UmeTrackNet`` trained against the teacher's pose outputs on
synthetic crops.

One command runs the full loop — train -> periodic checkpoint -> held-out
eval -> metric aggregation — and emits the BASELINE.md metric set (MPJPE mm,
MPJPA deg, PCK-AUC 0-50 mm, success rate, mean keypoint acceleration)
plus the per-checkpoint student-vs-teacher distillation gap:

    python -m umetrack_tpu.apps.distill --steps 200 --out /tmp/distill
"""
from __future__ import annotations

import argparse
import json
import logging
import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data import bundles
from ..data.transform import parse_raw_buffers, preprocess_sequence
from ..kinematics.skinning import skin_landmarks
from ..models import init_model
from ..models.config import ModelConfig
from ..models.umetrack import (
    FrameInputs,
    SkeletonInputs,
    TemporalState,
    UmeTrackNet,
    make_model,
)
from ..parallel import LossWeights, TrainBatch, create_train_state, train_step
from ..utils.checkpoints import save_checkpoint

logger = logging.getLogger(__name__)


def build_teacher(checkpoint: Optional[str] = None, seed: int = 0):
    """Teacher variables: converted from the reference torch model —
    pretrained when ``checkpoint`` points at a ``*.torch`` state dict, else
    the same architecture randomly initialized with ``seed``."""
    from ..models.convert import convert_state_dict, load_torch_checkpoint

    if checkpoint:
        return load_torch_checkpoint(checkpoint)

    import sys
    import types

    # Random-init teacher instantiates the reference torch model (parity
    # tooling; requires the read-only reference checkout).
    if not os.path.isdir("/root/reference/lib"):
        raise FileNotFoundError(
            "random-init teacher needs the reference checkout at "
            "/root/reference; pass --teacher <state.torch> instead"
        )
    sys.path.insert(0, "/root/reference")
    import torch

    if "pytorch3d" not in sys.modules:
        # minimal Rodrigues shim for the reference's pytorch3d dependency
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
            k = torch.stack(
                [zero, -z, y, z, zero, -x, -y, x, zero], dim=-1
            ).reshape(*aa.shape[:-1], 3, 3)
            eye = torch.eye(3, dtype=aa.dtype).expand_as(k)
            return (eye + a[..., None, None] * k
                    + b[..., None, None] * (k @ k))

        pkg = types.ModuleType("pytorch3d")
        tmod = types.ModuleType("pytorch3d.transforms")
        tmod.so3_exp_map = so3_exp_map
        pkg.transforms = tmod
        sys.modules["pytorch3d"] = pkg
        sys.modules["pytorch3d.transforms"] = tmod
    from lib.models import model_loader
    from lib.models.model_opts import ModelOpts

    torch.manual_seed(seed)
    from lib.models import feature_extractor as fe, temporal as tem
    from lib.models import skeleton_encoder as se
    from lib.models.umetrack_model import UmeTrackModel

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
    teacher.eval()
    sd = {k: v.detach().numpy() for k, v in teacher.state_dict().items()}
    return jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), convert_state_dict(sd)
    )


def _raw_frames(batch_size: int, seed: int):
    """One batch of single-frame synthetic torch_data samples (host)."""
    from ..utils.synthetic import make_torchdata_sample

    items = []
    for i in range(batch_size):
        mono, labels = make_torchdata_sample(
            rng_seed=seed + i, t=1, hand_idx=(seed + i) % 2
        )
        items.append(parse_raw_buffers(mono, labels))
    return bundles.collate(items)


@partial(jax.jit, static_argnames=("model", "crop_size"))
def _teacher_batch(
    model: UmeTrackNet, teacher_vars, raw_batch, crop_size=(96, 96)
) -> TrainBatch:
    """Preprocess on device and label the batch with the teacher's pose
    outputs: the student's TrainBatch uses teacher angles/wrists as GT."""
    model_input, _ = jax.vmap(
        lambda r: preprocess_sequence(r, crop_size)
    )(raw_batch)
    b = model_input.left_images.shape[0]
    v = model_input.left_images.shape[2]
    frame = FrameInputs(
        images=model_input.left_images[:, 0],
        intrinsics=model_input.intrinsics[:, 0],
        extrinsics=model_input.extrinsics_xf[:, 0],
        n_views=jnp.full((b,), v, jnp.int32),
        hand_idx=model_input.hand_idx[:, 0].astype(jnp.int32),
        use_memory=jnp.zeros((b,), bool),
    )
    hand = model_input.orig_pose_data.left_hand_model
    skeleton = SkeletonInputs(
        joint_rotation_axes=hand.joint_rotation_axes,
        joint_rest_positions=hand.joint_rest_positions,
    )
    t_out, _ = model.apply(
        teacher_vars, frame, skeleton, TemporalState.zeros(b, model.config),
        method=UmeTrackNet.known_skeleton,
    )
    return TrainBatch(
        frame=frame,
        skeleton=skeleton,
        gt_joint_angles=t_out.joint_angles,
        gt_wrist_world=t_out.wrist_xfs,
        hand=hand,
        gt_scales=None,
    )


@partial(jax.jit, static_argnames=("model",))
def _distill_gap_mm(model: UmeTrackNet, student_vars, batch: TrainBatch):
    """Held-out student-vs-teacher landmark distance (mm): how closely the
    student reproduces the teacher's poses."""
    b = batch.gt_joint_angles.shape[0]
    s_out, _ = model.apply(
        student_vars, batch.frame, batch.skeleton,
        TemporalState.zeros(b, model.config),
        method=UmeTrackNet.known_skeleton,
    )
    t_lm = skin_landmarks(
        batch.hand, batch.gt_joint_angles, batch.gt_wrist_world
    )
    s_lm = skin_landmarks(batch.hand, s_out.joint_angles, s_out.wrist_xfs)
    return jnp.linalg.norm(t_lm - s_lm, axis=-1).mean() * 1000.0


def run_distillation(
    steps: int = 200,
    batch_size: int = 8,
    eval_every: int = 50,
    learning_rate: float = 3e-4,
    teacher_checkpoint: Optional[str] = None,
    out_dir: Optional[str] = None,
    n_eval_sequences: int = 2,
    seed: int = 0,
):
    """Returns (gaps, final_metrics): the per-checkpoint distillation gap and
    the BASELINE.md metric set of the final student on held-out synthetic
    sequences (teacher poses as reference)."""
    config = ModelConfig()
    model = make_model(config)
    teacher_vars = build_teacher(teacher_checkpoint, seed=seed)
    _, student_vars = init_model(jax.random.PRNGKey(seed + 1), config)

    optimizer = optax.adamw(learning_rate, weight_decay=1e-5)
    ts = create_train_state(student_vars, optimizer)
    weights = LossWeights()

    heldout = _teacher_batch(
        model, teacher_vars, _raw_frames(16, seed=10_000), (96, 96)
    )

    gaps = []
    for step in range(steps):
        raw = _raw_frames(batch_size, seed=seed + step * batch_size)
        batch = _teacher_batch(model, teacher_vars, raw, (96, 96))
        ts, metrics = train_step(model, optimizer, ts, batch, weights)
        if step % eval_every == 0 or step == steps - 1:
            sv = {"params": ts.params, "batch_stats": ts.batch_stats}
            gap = float(_distill_gap_mm(model, sv, heldout))
            gaps.append(gap)
            logger.info(
                "step %d: loss=%.5f heldout distill gap=%.2f mm",
                step, float(metrics["loss"]), gap,
            )
            if out_dir:
                save_checkpoint(
                    f"{out_dir}/ckpt_step_{step:07d}", sv
                )

    # Final: full tracked eval on held-out synthetic sequences, with the
    # TEACHER's tracked poses as the comparison target, aggregated with the
    # BASELINE.md metric set (load_eval protocol).
    from .. import metrics as metrics_mod
    from ..tracker import HandTracker, sequence_landmarks
    from ..utils import synthetic

    student = HandTracker(
        model, {"params": ts.params, "batch_stats": ts.batch_stats}
    )
    teacher = HandTracker(model, teacher_vars)

    per_seq, valid_list = [], []
    for i in range(n_eval_sequences):
        labels, images = synthetic.make_labels_dict(8, rng_seed=20_000 + i)
        rig, seq, hand = synthetic.our_sequence(labels, images)
        res_s, _ = student.track_sequence(rig, seq, hand)
        res_t, _ = teacher.track_sequence(rig, seq, hand)
        lm_s = np.asarray(
            sequence_landmarks(hand, res_s.joint_angles, res_s.wrist_xfs)
        )
        lm_t = np.asarray(
            sequence_landmarks(hand, res_t.joint_angles, res_t.wrist_xfs)
        )
        valid = np.moveaxis(np.asarray(res_s.valid & res_t.valid), 0, 1)
        m = metrics_mod.compute_sequence_metrics(
            np.moveaxis(lm_t, 0, 1),  # teacher poses as the reference
            np.moveaxis(lm_s, 0, 1),
            valid,
            np.moveaxis(np.asarray(res_t.joint_angles), 0, 1),
            np.moveaxis(np.asarray(res_s.joint_angles), 0, 1),
        )
        per_seq.append(m)
        valid_list.append(valid)
    final = metrics_mod.aggregate(per_seq, valid_list)
    final["distill_gap_mm"] = gaps
    return gaps, final


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--steps", type=int, default=200)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--eval-every", type=int, default=50)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--teacher", default=None,
                        help="reference *.torch state dict (pretrained)")
    parser.add_argument("--out", default=None, help="checkpoint directory")
    parser.add_argument("--eval-sequences", type=int, default=2)
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    from ..utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    gaps, final = run_distillation(
        steps=args.steps,
        batch_size=args.batch_size,
        eval_every=args.eval_every,
        learning_rate=args.lr,
        teacher_checkpoint=args.teacher,
        out_dir=args.out,
        n_eval_sequences=args.eval_sequences,
    )
    print(json.dumps(final, default=float))
    return final


if __name__ == "__main__":
    main()

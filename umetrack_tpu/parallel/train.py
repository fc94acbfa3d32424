"""Training step (greenfield: the reference ships no training code).

A full supervised step for the known-skeleton head with a scale-head
auxiliary, designed to avoid differentiating through the SVD wrist decode:

- joint-angle MSE over the 20 actuated DoF
- wrist supervision on the raw predicted rigid points in crop-cam0 space
  against the GT-transformed canonical points (regressor.py:19-47 geometry)
- landmark Gaussian NLL: landmarks skinned from predicted angles + GT wrist,
  scored against GT landmarks under the predicted per-landmark sigmas
- optional log-scale MSE for the scale-prediction head

Runs under pjit on a (data, model) mesh: batch sharded over ``data``, large
conv kernels sharded over ``model`` (see mesh.py); XLA inserts the psums.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..geometry import affine
from ..kinematics.hand import HandModel
from ..kinematics.skinning import skin_landmarks
from ..models.components import gen_rigid_points
from ..models.umetrack import (
    FrameInputs,
    SkeletonInputs,
    TemporalState,
    UmeTrackNet,
)


@struct.dataclass
class TrainBatch:
    """One batch of supervised hand samples (meters)."""

    frame: FrameInputs
    skeleton: SkeletonInputs  # [B, 22, 3] each
    gt_joint_angles: jnp.ndarray  # [B, 22]
    gt_wrist_world: jnp.ndarray  # [B, 4, 4] left-convention, meters
    hand: HandModel  # batched [B, ...] (left, meters)
    gt_scales: Optional[jnp.ndarray] = None  # [B]
    # Per-row supervision mask (ADVICE r3): rows whose crops were invalid
    # (hand out of view / zero valid views floored to 1) must not be trained
    # against real GT on a meaningless fallback crop.  None = all valid.
    valid: Optional[jnp.ndarray] = None  # [B] bool


@struct.dataclass
class TemporalTrainBatch:
    """A batch of K-frame supervised windows (meters); time axis second.

    Training through time is what actually exercises the conv-RNN memory
    (reference temporal.py:93-139): ``use_memory`` should be False at k=0 and
    True after, and extrinsics should move frame-to-frame so the FTL motion
    compensation is active in the gradient path.
    """

    frames: FrameInputs  # leaves [B, K, ...]
    skeleton: SkeletonInputs  # [B, 22, 3] each
    gt_joint_angles: jnp.ndarray  # [B, K, 22]
    gt_wrist_world: jnp.ndarray  # [B, K, 4, 4] left-convention, meters
    hand: HandModel  # batched [B, ...] (left, meters)
    gt_scales: Optional[jnp.ndarray] = None  # [B]
    # Per-(row, frame) supervision mask; see TrainBatch.valid.
    valid: Optional[jnp.ndarray] = None  # [B, K] bool


@struct.dataclass
class TrainState:
    params: dict
    batch_stats: dict
    opt_state: optax.OptState
    step: jnp.ndarray


@struct.dataclass
class LossWeights:
    angles: float = 1.0
    wrist_points: float = 1.0
    landmark_nll: float = 0.1
    scale: float = 0.1
    # Extra gain on the CENTERED component of the wrist-point error.  The
    # point MSE decomposes exactly (cross term vanishes) into centroid error
    # (translation) + centered error (what Procrustes turns into rotation);
    # at 1.0 this is the plain MSE.  Round-4 diagnosis: wrist rotation
    # (8.8 deg) dominated the overfit MPJPE while angles were at 1.7 mm —
    # the rotation-carrying component needs more gradient share.
    wrist_rot_gain: float = 1.0
    # Temporal-smoothness weight (temporal_loss_fn only): squared error
    # between the 2nd difference (acceleration) of predicted vs GT world
    # landmarks/wrist-points over the TBPTT window.  Round-4 finding:
    # tracked keypoint acceleration was ~17x GT (the reference reports this
    # metric, load_eval.py:26-44) because nothing penalized frame-to-frame
    # jitter.  Units are meters^2 of acceleration — amplitudes are ~1e-3 m,
    # so useful weights are O(1e3).
    accel: float = 0.0


def create_train_state(
    variables, optimizer: optax.GradientTransformation
) -> TrainState:
    return TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )


def _frame_losses(
    model: UmeTrackNet,
    out,
    frame: FrameInputs,
    gt_joint_angles: jnp.ndarray,
    gt_wrist_world: jnp.ndarray,
    hand: HandModel,
    valid: Optional[jnp.ndarray] = None,  # [B] bool row mask
    rot_gain: float | jnp.ndarray = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-frame supervised terms shared by the single-frame and TBPTT
    losses: (angle MSE, wrist rigid-point MSE in cam0, landmark NLL,
    valid-row count).  Losses are sums over valid rows / per-row means over
    their inner dims; callers divide by the returned count so masked rows
    contribute exactly nothing (ADVICE r3: fallback crops of invalid rows
    must not be supervised against real GT)."""
    b = gt_joint_angles.shape[0]
    w_row = (
        jnp.ones((b,), jnp.float32)
        if valid is None
        else valid.astype(jnp.float32)
    )
    count = jnp.sum(w_row)

    # 1) finger-angle MSE (wrist slots are identically zero on both sides)
    angle_loss = jnp.sum(
        w_row
        * jnp.mean((out.joint_angles[:, :20] - gt_joint_angles[:, :20]) ** 2,
                   axis=-1)
    )

    # 2) wrist rigid points in cam0.  The model's decode chain is
    # points -> Procrustes (proper rotation) -> cam0->world -> mirror the x
    # basis column for right hands (umetrack_model.py:77-90).  Right-hand
    # crop cameras are themselves x-mirrored (det(e0) = -1), so the
    # pre-mirror cam0 target must use the GT wrist with its x column
    # mirrored: e0 @ mirror_x(gt) is then a PROPER rigid transform whose
    # rigid points Procrustes can represent, and the full decode chain
    # applied to these targets reproduces gt_wrist_world exactly
    # (tests/test_parallel.py::test_wrist_point_targets_decode_consistently).
    e0 = frame.extrinsics[:, 0]
    sign = jnp.where(frame.hand_idx == 1, -1.0, 1.0).astype(
        gt_wrist_world.dtype
    )
    gt_eff = gt_wrist_world.at[..., :, 0].multiply(sign[:, None])
    gt_wrist_cam0 = e0 @ gt_eff
    rigid = jnp.asarray(gen_rigid_points(model.config.n_wrist_rigid_pts))
    gt_points = jax.vmap(lambda m: affine.transform3(m, rigid))(gt_wrist_cam0)
    # centroid/centered split (exact decomposition of the MSE; see
    # LossWeights.wrist_rot_gain)
    pred_c = jnp.mean(out.wrist_points, axis=-2, keepdims=True)
    gt_c = jnp.mean(gt_points, axis=-2, keepdims=True)
    trans_mse = jnp.mean((pred_c - gt_c) ** 2, axis=(-2, -1))
    rot_mse = jnp.mean(
        ((out.wrist_points - pred_c) - (gt_points - gt_c)) ** 2,
        axis=(-2, -1),
    )
    point_loss = jnp.sum(w_row * (trans_mse + rot_gain * rot_mse))

    # 3) landmark NLL with predicted angles + GT wrist (no SVD in the path)
    pred_lm = skin_landmarks(hand, out.joint_angles, gt_wrist_world)
    gt_lm = skin_landmarks(hand, gt_joint_angles, gt_wrist_world)
    err = jnp.linalg.norm(pred_lm - gt_lm + 1e-12, axis=-1)  # [B, 21]
    # Training-side sigma floor of 1 mm: the decode's reference-parity clamp
    # is 1e-5 (regressor.py:120), but once sigmas shrink to ~0.5 mm a domain
    # shift makes (err/sigma)^2 explode and NaN the run (observed in round 3
    # when fine-tuning onto the tracker-crop domain).  The floor only caps
    # the NLL's confidence reward; the decode itself is untouched.
    sig = jnp.maximum(out.landmark_uncertainty_sigmas, 1e-3)
    nll = jnp.sum(
        w_row * jnp.mean(jnp.log(sig) + 0.5 * (err / sig) ** 2, axis=-1)
    )

    return angle_loss, point_loss, nll, count


def loss_fn(
    model: UmeTrackNet,
    params,
    batch_stats,
    batch: TrainBatch,
    weights: LossWeights = LossWeights(),
) -> Tuple[jnp.ndarray, Tuple[dict, dict]]:
    b = batch.gt_joint_angles.shape[0]
    variables = {"params": params, "batch_stats": batch_stats}
    state = TemporalState.zeros(b, model.config)

    (out, _), mutated = model.apply(
        variables,
        batch.frame,
        batch.skeleton,
        state,
        True,  # train
        method=UmeTrackNet.known_skeleton,
        mutable=["batch_stats"],
    )

    angle_loss, point_loss, nll, count = _frame_losses(
        model, out, batch.frame, batch.gt_joint_angles,
        batch.gt_wrist_world, batch.hand, batch.valid,
        rot_gain=weights.wrist_rot_gain,
    )
    denom = jnp.maximum(count, 1.0)
    angle_loss, point_loss, nll = (
        angle_loss / denom, point_loss / denom, nll / denom
    )

    total = (
        weights.angles * angle_loss
        + weights.wrist_points * point_loss
        + weights.landmark_nll * nll
    )

    # 4) scale head (optional).  Masked like the other terms: rows whose
    # crops were invalid must not train the scale head against real
    # gt_scales on a meaningless fallback crop (ADVICE r4).
    scale_loss = jnp.zeros(())
    if batch.gt_scales is not None:
        (out_u, _), mutated_u = model.apply(
            variables,
            batch.frame,
            state,
            True,
            method=UmeTrackNet.predict_scale,
            mutable=["batch_stats"],
        )
        w_row = (
            jnp.ones_like(batch.gt_scales)
            if batch.valid is None
            else batch.valid.astype(batch.gt_scales.dtype)
        )
        sq = (jnp.log(out_u.skel_scales) - jnp.log(batch.gt_scales)) ** 2
        scale_loss = jnp.sum(w_row * sq) / jnp.maximum(jnp.sum(w_row), 1.0)
        total = total + weights.scale * scale_loss

    metrics = {
        "loss": total,
        "angle_loss": angle_loss,
        "point_loss": point_loss,
        "landmark_nll": nll,
        "scale_loss": scale_loss,
    }
    return total, (mutated["batch_stats"], metrics)


def temporal_loss_fn(
    model: UmeTrackNet,
    params,
    batch_stats,
    batch: TemporalTrainBatch,
    weights: LossWeights = LossWeights(),
) -> Tuple[jnp.ndarray, Tuple[dict, dict]]:
    """TBPTT loss: ``lax.scan`` over the K-frame window threading the
    ``TemporalState`` carry, so gradients flow into the memory pathway
    (``temporal/conv*`` mem-input channels) through real recurrence —
    including the FTL motion compensation, which is active whenever
    ``frames.use_memory[:, k]`` is set (reference temporal.py:51-139)."""
    b, k = batch.gt_joint_angles.shape[:2]
    state0 = TemporalState.zeros(b, model.config)

    time_major = lambda a: jnp.moveaxis(a, 0, 1)
    frames_t = jax.tree_util.tree_map(time_major, batch.frames)
    valid_t = (
        jnp.ones((k, b), bool)
        if batch.valid is None
        else time_major(batch.valid)
    )
    xs = (
        frames_t,
        time_major(batch.gt_joint_angles),
        time_major(batch.gt_wrist_world),
        valid_t,
    )

    def step(carry, x):
        state, stats = carry
        frame, gt_angles, gt_wrist, valid = x
        (out, new_state), mutated = model.apply(
            {"params": params, "batch_stats": stats},
            frame,
            batch.skeleton,
            state,
            True,  # train
            method=UmeTrackNet.known_skeleton,
            mutable=["batch_stats"],
        )
        losses = _frame_losses(
            model, out, frame, gt_angles, gt_wrist, batch.hand, valid,
            rot_gain=weights.wrist_rot_gain,
        )
        # ys carry only RAW head outputs; the smoothness term's landmark /
        # world-point reconstructions happen AFTER the scan (a simpler scan
        # transpose — in-scan aux pytrees made the XLA:CPU compiler segfault
        # on the backward pass in full-suite runs).
        return (new_state, mutated["batch_stats"]), (
            jnp.stack(losses), out.joint_angles, out.wrist_points
        )

    # Rematerialize the per-frame body in the backward pass: standard TBPTT
    # memory/compile trade (activations of K full model applies are not kept
    # alive), and it keeps the scan's linearized program small — the XLA:CPU
    # LLVM backend segfaulted compiling the un-remat'd scan linearization
    # after ~130 prior in-process compiles (full-suite runs only; each test
    # file alone passes).  Numerics are unchanged by remat.
    (_, new_stats), (per_step, angles_t, pts_t) = jax.lax.scan(
        jax.checkpoint(step), (state0, batch_stats), xs
    )
    # per_step rows are (sum, sum, sum, count) — normalize over ALL valid
    # (row, frame) supervision slots in the window.
    sums = jnp.sum(per_step, axis=0)
    denom = jnp.maximum(sums[3], 1.0)
    angle_loss, point_loss, nll = sums[0] / denom, sums[1] / denom, sums[2] / denom

    # Temporal smoothness: 2nd difference (acceleration) of predicted vs GT
    # world landmarks and wrist rigid points across the window, masked to
    # triples of consecutive valid frames.  SVD-free (landmarks use the GT
    # wrist; wrist points are the raw pre-Procrustes predictions mapped to
    # world through the orthogonal crop-cam0 inverse).  Round-4: tracked
    # acceleration ~17x GT with nothing in the loss touching it.  All
    # reconstructions happen post-scan from the stacked raw outputs.
    accel_loss = jnp.zeros(())
    if k >= 3:
        gt_angles_t = time_major(batch.gt_joint_angles)  # [K, B, 22]
        gt_wrist_t = time_major(batch.gt_wrist_world)  # [K, B, 4, 4]
        # hand is [B, ...]; vmap the skinning over the time axis
        lm_fn = lambda a, w: skin_landmarks(batch.hand, a, w)
        pred_lm_t = jax.vmap(lm_fn)(angles_t, gt_wrist_t)
        gt_lm_t = jax.vmap(lm_fn)(gt_angles_t, gt_wrist_t)

        # world-space wrist points: e0's 3x3 block is orthogonal (rotation,
        # possibly x-mirrored for right hands — det -1), so its inverse is
        # the transpose formula either way.
        e0_t = frames_t.extrinsics[:, :, 0]  # [K, B, 4, 4]
        r0t = jnp.swapaxes(e0_t[..., :3, :3], -1, -2)
        t0 = e0_t[..., :3, 3]

        def to_world(pts):  # [K, B, P, 3] cam0 -> world
            return jnp.einsum(
                "kbij,kbpj->kbpi", r0t, pts - t0[:, :, None, :]
            )

        sign = jnp.where(frames_t.hand_idx == 1, -1.0, 1.0).astype(
            gt_wrist_t.dtype
        )  # [K, B]
        gt_eff_t = gt_wrist_t.at[..., :, 0].multiply(sign[..., None])
        rigid = jnp.asarray(gen_rigid_points(model.config.n_wrist_rigid_pts))
        gt_pts_t = affine.transform3((e0_t @ gt_eff_t)[:, :, None], rigid)

        def second_diff(x):  # [K, B, ...] -> [K-2, B, ...]
            return x[2:] + x[:-2] - 2.0 * x[1:-1]

        valid3 = (
            valid_t[2:] & valid_t[:-2] & valid_t[1:-1]
        ).astype(jnp.float32)  # [K-2, B]
        n3 = jnp.maximum(jnp.sum(valid3), 1.0)

        def accel_term(pred, gt):
            d = second_diff(pred) - second_diff(gt)
            per = jnp.mean(jnp.sum(d * d, axis=-1), axis=-1)  # [K-2, B]
            return jnp.sum(valid3 * per) / n3

        accel_loss = accel_term(pred_lm_t, gt_lm_t) + accel_term(
            to_world(pts_t), to_world(gt_pts_t)
        )

    total = (
        weights.angles * angle_loss
        + weights.wrist_points * point_loss
        + weights.landmark_nll * nll
        + weights.accel * accel_loss
    )

    # Scale head on the first frame only (zero state, no memory), mirroring
    # the single-frame loss; it shares the extractor/temporal trunk.
    scale_loss = jnp.zeros(())
    if batch.gt_scales is not None:
        frame0 = jax.tree_util.tree_map(lambda a: a[0], frames_t)
        (out_u, _), new_stats = model.apply(
            {"params": params, "batch_stats": new_stats},
            frame0,
            state0,
            True,
            method=UmeTrackNet.predict_scale,
            mutable=["batch_stats"],
        )
        new_stats = new_stats["batch_stats"]
        # Frame-0 validity mask (the head is only run on frame 0); see the
        # single-frame loss for the rationale (ADVICE r4).
        w_row = (
            jnp.ones_like(batch.gt_scales)
            if batch.valid is None
            else batch.valid[:, 0].astype(batch.gt_scales.dtype)
        )
        sq = (jnp.log(out_u.skel_scales) - jnp.log(batch.gt_scales)) ** 2
        scale_loss = jnp.sum(w_row * sq) / jnp.maximum(jnp.sum(w_row), 1.0)
        total = total + weights.scale * scale_loss
    metrics = {
        "loss": total,
        "angle_loss": angle_loss,
        "point_loss": point_loss,
        "landmark_nll": nll,
        "scale_loss": scale_loss,
        "accel_loss": accel_loss,
    }
    return total, (new_stats, metrics)


def _apply_grads(
    optimizer: optax.GradientTransformation,
    ts: TrainState,
    grads,
    new_stats,
) -> TrainState:
    updates, new_opt_state = optimizer.update(grads, ts.opt_state, ts.params)
    new_params = optax.apply_updates(ts.params, updates)
    return TrainState(
        params=new_params,
        batch_stats=new_stats,
        opt_state=new_opt_state,
        step=ts.step + 1,
    )


@partial(jax.jit, static_argnames=("model", "optimizer"))
def train_step(
    model: UmeTrackNet,
    optimizer: optax.GradientTransformation,
    ts: TrainState,
    batch: TrainBatch,
    weights: LossWeights = LossWeights(),
) -> Tuple[TrainState, dict]:
    """One optimizer step; shardings flow from the (params, batch) placement."""
    grad_fn = jax.value_and_grad(
        lambda p: loss_fn(model, p, ts.batch_stats, batch, weights),
        has_aux=True,
    )
    (_, (new_stats, metrics)), grads = grad_fn(ts.params)
    return _apply_grads(optimizer, ts, grads, new_stats), metrics


@partial(jax.jit, static_argnames=("model", "optimizer"))
def temporal_train_step(
    model: UmeTrackNet,
    optimizer: optax.GradientTransformation,
    ts: TrainState,
    batch: TemporalTrainBatch,
    weights: LossWeights = LossWeights(),
) -> Tuple[TrainState, dict]:
    """One TBPTT optimizer step over a K-frame window."""
    grad_fn = jax.value_and_grad(
        lambda p: temporal_loss_fn(model, p, ts.batch_stats, batch, weights),
        has_aux=True,
    )
    (_, (new_stats, metrics)), grads = grad_fn(ts.params)
    return _apply_grads(optimizer, ts, grads, new_stats), metrics


def synthetic_train_batch(rng_seed: int, batch: int, hand: HandModel) -> TrainBatch:
    """Random-but-consistent batch for smoke tests and sharding dryruns.

    ``hand`` is an unbatched left-hand model in mm; it is scaled to meters
    and broadcast over the batch.
    """
    import numpy as np

    from ..kinematics.hand import scaled_hand_model

    rng = np.random.default_rng(rng_seed)
    hand_m = scaled_hand_model(hand, 0.001)
    hand_b = jax.tree_util.tree_map(
        lambda a: None if a is None else jnp.broadcast_to(a, (batch, *a.shape)),
        hand_m,
    )

    q, _ = np.linalg.qr(rng.standard_normal((batch, 3, 3)))
    det = np.linalg.det(q)
    q[..., :, 0] *= np.where(det < 0, -1.0, 1.0)[:, None]
    wrist = np.tile(np.eye(4, dtype=np.float32), (batch, 1, 1))
    wrist[:, :3, :3] = q
    wrist[:, :3, 3] = rng.standard_normal((batch, 3)) * 0.05

    intr = np.tile(np.eye(3, dtype=np.float32), (batch, 2, 1, 1))
    intr[..., 0, 0] = rng.uniform(150, 300, (batch, 2))
    intr[..., 1, 1] = intr[..., 0, 0]
    intr[..., 0, 2] = intr[..., 1, 2] = 47.5

    qe, _ = np.linalg.qr(rng.standard_normal((batch * 2, 3, 3)))
    dete = np.linalg.det(qe)
    qe[..., :, 0] *= np.where(dete < 0, -1.0, 1.0)[:, None]
    extr = np.tile(np.eye(4, dtype=np.float32), (batch * 2, 1, 1))
    extr[:, :3, :3] = qe
    extr[:, :3, 3] = rng.standard_normal((batch * 2, 3)) * 0.3

    frame = FrameInputs(
        images=jnp.asarray(rng.uniform(0, 1, (batch, 2, 96, 96)), jnp.float32),
        intrinsics=jnp.asarray(intr),
        extrinsics=jnp.asarray(extr.reshape(batch, 2, 4, 4)),
        n_views=jnp.full((batch,), 2, jnp.int32),
        hand_idx=jnp.asarray(rng.integers(0, 2, batch), jnp.int32),
        use_memory=jnp.zeros((batch,), bool),
    )
    skeleton = SkeletonInputs(
        joint_rotation_axes=hand_b.joint_rotation_axes,
        joint_rest_positions=hand_b.joint_rest_positions,
    )
    return TrainBatch(
        frame=frame,
        skeleton=skeleton,
        gt_joint_angles=jnp.asarray(
            rng.uniform(-0.5, 0.5, (batch, 22)), jnp.float32
        ),
        gt_wrist_world=jnp.asarray(wrist),
        hand=hand_b,
        gt_scales=jnp.asarray(rng.uniform(0.8, 1.2, batch), jnp.float32),
    )

"""The temporal hand tracker — every per-frame step runs on-device in jit.

TPU-native rebuild of the reference ``lib/tracker/tracker.py``: one jitted
step fuses crop-camera generation (from GT pose, per eval protocol), the
fisheye->pinhole crop warp, the model forward, the pose decode and the state
update; whole sequences run under ``jax.lax.scan`` with the temporal memory
and tracking-history flags as explicit carry.  Only video decode stays on
the host.

Units contract (tracker.py:26-27,215,258): tracker API is mm, the model
consumes meters.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..geometry import affine
from ..geometry.cameras import Fisheye62Camera
from ..kinematics.hand import HandModel, scaled_hand_model
from ..models.umetrack import (
    FrameInputs,
    SkeletonInputs,
    TemporalState,
    UmeTrackNet,
    memory_motion_transform,
)
from ..ops.resample import (
    default_sampler,
    fisheye_to_pinhole_coords,
    warp_fisheye_to_pinhole,
)
from .crops import gen_crop_set, landmarks_from_pose
from .types import (
    M_TO_MM,
    MM_TO_M,
    CameraRig,
    CropSet,
    FrameObservation,
    FrameResult,
    TrackState,
    TrackerConfig,
)


def _resolved_sampler(config: TrackerConfig) -> str:
    """Tracker-level sampler resolution.  The image-POOL kernel
    ("pallas_pool", ops/pallas_resample.py) is the TPU default: the per-warp
    vmap of any single-image sampler makes XLA materialize a preprocessed
    full source view PER WARP (docs/ROOFLINE.md round-4 finding — the
    dominant sampling cost), while the pool kernel preprocesses each camera
    image once and selects it per block via a scalar-prefetched index_map."""
    if config.sampler:
        return config.sampler
    try:
        on_tpu = jax.default_backend() in ("tpu", "axon")
    except Exception:
        on_tpu = False
    return "pallas_pool" if on_tpu else default_sampler()


def _pool_interpret() -> bool:
    """The pool kernel has no XLA fallback; run it in interpret mode off-TPU
    (CPU tests) — decided at trace time like every other backend switch."""
    try:
        return jax.default_backend() not in ("tpu", "axon")
    except Exception:
        return True


def _crop_coords(
    rig: CameraRig,
    T_world_from_camera: jnp.ndarray,  # [N, 4, 4]
    crop_set: CropSet,
    crop_size: Tuple[int, int],
) -> jnp.ndarray:  # [2*V, h, w, 2]
    """Per-slot fisheye source-coordinate fields for one frame (the cheap
    per-warp math; the expensive sampling goes through the pool kernel)."""
    flat_src = crop_set.src_cam_idx.reshape(-1)
    flat_k = crop_set.intrinsics.reshape(-1, 3, 3)
    flat_t = crop_set.T_world_from_eye.reshape(-1, 4, 4)

    def coords_one(src_idx, k, t_wfe):
        cam = Fisheye62Camera(
            fx=rig.fx[src_idx],
            fy=rig.fy[src_idx],
            cx=rig.cx[src_idx],
            cy=rig.cy[src_idx],
            width=rig.width[src_idx],
            height=rig.height[src_idx],
            coeffs=rig.coeffs[src_idx],
            T_world_from_eye=T_world_from_camera[src_idx],
        )
        return fisheye_to_pinhole_coords(k, t_wfe, cam, crop_size)

    return jax.vmap(coords_one)(flat_src, flat_k, flat_t)


def _pool_warp_frames(
    images: jnp.ndarray,  # [F, N, H, W] raw views (F = flattened frames)
    coords: jnp.ndarray,  # [F, 2*V, h, w, 2]
    src_cam_idx: jnp.ndarray,  # [F, 2*V] per-slot source camera
    view_valid: jnp.ndarray,  # [F, 2, V]
    use_int8: bool = True,
    sublanes: int = 24,
    win_x: int = 128,
) -> jnp.ndarray:  # [F, 2, V, h, w] in [0, 1]
    """ONE pool-kernel call for every warp of every frame: the F*N source
    views are preprocessed once and selected per block inside the pipeline
    (no per-warp image materialization)."""
    from ..ops.pallas_resample import pallas_bilinear_sample_pool

    f, n, h, w = images.shape
    slots = coords.shape[1]
    ch, cw = coords.shape[2], coords.shape[3]
    src_global = (
        jnp.arange(f, dtype=jnp.int32)[:, None] * n
        + src_cam_idx.reshape(f, slots)
    ).reshape(-1)
    out = pallas_bilinear_sample_pool(
        images.reshape(f * n, h, w),
        coords.reshape(f * slots, ch, cw, 2),
        src_global,
        use_int8=use_int8,
        interpret=_pool_interpret(),
        sublanes=sublanes,
        win_x=win_x,
    )
    warped = out.reshape(f, *view_valid.shape[1:], ch, cw)
    warped = warped.astype(jnp.float32) / 255.0
    return jnp.where(view_valid[..., None, None], warped, 0.0)


def _warp_crops(
    rig: CameraRig,
    images: jnp.ndarray,  # [N, H, W]
    T_world_from_camera: jnp.ndarray,  # [N, 4, 4]
    crop_set: CropSet,
    crop_size: Tuple[int, int],
    sampler: str | None = None,
    use_int8: bool = True,
) -> jnp.ndarray:  # [2, V, h, w] in [0, 1]
    """Warp each (hand, view) slot's source fisheye view into its crop
    camera (reference _warp_image + /255, tracker.py:54-80,211)."""

    flat_src = crop_set.src_cam_idx.reshape(-1)  # [2*V]
    flat_k = crop_set.intrinsics.reshape(-1, 3, 3)
    flat_t = crop_set.T_world_from_eye.reshape(-1, 4, 4)

    def warp_one(src_idx, k, t_wfe):
        cam = Fisheye62Camera(
            fx=rig.fx[src_idx],
            fy=rig.fy[src_idx],
            cx=rig.cx[src_idx],
            cy=rig.cy[src_idx],
            width=rig.width[src_idx],
            height=rig.height[src_idx],
            coeffs=rig.coeffs[src_idx],
            T_world_from_eye=T_world_from_camera[src_idx],
        )
        img = jnp.take(images, src_idx, axis=0)
        return warp_fisheye_to_pinhole(
            img, k, t_wfe, cam, crop_size, method=sampler, use_int8=use_int8
        )

    warped = jax.vmap(warp_one)(flat_src, flat_k, flat_t)
    warped = warped.reshape(*crop_set.src_cam_idx.shape, *crop_size)
    warped = warped.astype(jnp.float32) / 255.0
    return jnp.where(crop_set.view_valid[..., None, None], warped, 0.0)


def _frame_inputs_from_crops(
    crop_set: CropSet,
    crop_images: jnp.ndarray,  # [B, V, h, w]
    state: TrackState,
    enable_memory: bool,
    hand_idx: jnp.ndarray | None = None,
) -> FrameInputs:
    """Assemble dense model inputs; invalid view slots inherit view-0
    geometry so every lane stays finite and orthonormal.

    ``hand_idx`` defaults to (0, 1) for the single-frame 2-hand layout; the
    batched multi-sequence path passes a tiled pattern.
    """
    extr_mm = affine.rigid_inverse(crop_set.T_world_from_eye)
    extr_m = extr_mm.at[..., :3, 3].multiply(MM_TO_M)

    vv = crop_set.view_valid[..., None, None]
    extr_m = jnp.where(vv, extr_m, extr_m[:, 0:1])
    intr = jnp.where(vv, crop_set.intrinsics, crop_set.intrinsics[:, 0:1])

    use_memory = state.valid_history & crop_set.hand_valid
    if not enable_memory:
        use_memory = jnp.zeros_like(use_memory)

    if hand_idx is None:
        assert crop_images.shape[0] == 2, (
            "default hand_idx assumes the [left, right] 2-hand layout; pass "
            "hand_idx explicitly for other batches"
        )
        hand_idx = jnp.arange(2, dtype=jnp.int32)
    return FrameInputs(
        images=crop_images,
        intrinsics=intr,
        extrinsics=extr_m,
        n_views=jnp.maximum(crop_set.n_views, 1),
        hand_idx=hand_idx,
        use_memory=use_memory,
    )


def _track_step(
    model: UmeTrackNet,
    config: TrackerConfig,
    variables,
    rig: CameraRig,
    obs: FrameObservation,
    state: TrackState,
    hand_model_mm: HandModel,
    min_num_crops: int,
    known: bool,
    skel_hand_model_mm: HandModel = None,
) -> Tuple[FrameResult, TrackState]:
    """One fused tracker step: crops -> warp -> forward -> decode -> state."""
    crop_set = gen_crop_set(
        rig,
        obs.T_world_from_camera,
        hand_model_mm,
        obs.gt_joint_angles,
        obs.gt_wrist_xfs,
        obs.gt_confidences,
        config,
        min_num_crops,
    )
    if _resolved_sampler(config) == "pallas_pool":
        coords = _crop_coords(
            rig, obs.T_world_from_camera, crop_set, config.crop_size
        )
        crop_images = _pool_warp_frames(
            obs.images[None], coords[None],
            crop_set.src_cam_idx.reshape(1, -1), crop_set.view_valid[None],
            use_int8=config.pallas_int8,
            sublanes=config.pool_sublanes, win_x=config.pool_win_x,
        )[0]
    else:
        crop_images = _warp_crops(
            rig, obs.images, obs.T_world_from_camera, crop_set,
            config.crop_size, sampler=config.sampler,
            use_int8=config.pallas_int8,
        )
    frame = _frame_inputs_from_crops(
        crop_set, crop_images, state, config.enable_memory
    )

    if known:
        # Crops always come from ``hand_model_mm`` (the GT skeleton per the
        # eval protocol); the model's skeleton input may differ — e.g. the
        # calibrated generic skeleton in unknown-skeleton pass 2
        # (run_eval_unknown_skeleton.py:110-119).
        skel_src = hand_model_mm if skel_hand_model_mm is None else skel_hand_model_mm
        hand_model_m = scaled_hand_model(skel_src, MM_TO_M)
        skeleton = SkeletonInputs(
            joint_rotation_axes=hand_model_m.joint_rotation_axes[None],
            joint_rest_positions=hand_model_m.joint_rest_positions[None],
        )
        out, new_temporal = model.apply(
            variables, frame, skeleton, state.temporal,
            method=UmeTrackNet.known_skeleton,
        )
    else:
        out, new_temporal = model.apply(
            variables, frame, state.temporal, method=UmeTrackNet.predict_scale
        )

    wrist_mm = out.wrist_xfs.at[..., :3, 3].multiply(M_TO_MM)
    result = FrameResult(
        joint_angles=out.joint_angles,
        wrist_xfs=wrist_mm,
        valid=crop_set.hand_valid,
        n_views=crop_set.n_views,
        predicted_scales=out.skel_scales,
    )
    new_state = TrackState(
        temporal=new_temporal, valid_history=crop_set.hand_valid
    )
    return result, new_state


@partial(
    jax.jit, static_argnames=("model", "config", "min_num_crops", "known")
)
def track_frame(
    model: UmeTrackNet,
    config: TrackerConfig,
    variables,
    rig: CameraRig,
    obs: FrameObservation,
    state: TrackState,
    hand_model_mm: HandModel,
    min_num_crops: int = 1,
    known: bool = True,
) -> Tuple[FrameResult, TrackState]:
    """Single-frame streaming entry point (reference track_frame /
    track_frame_and_calibrate_scale, tracker.py:141-192)."""
    return _track_step(
        model, config, variables, rig, obs, state, hand_model_mm,
        min_num_crops, known,
    )


def _prepare_sequence(
    config: TrackerConfig,
    rig: CameraRig,
    seq: FrameObservation,  # leading T axis
    hand_model_mm: HandModel,
    min_num_crops: int,
) -> Tuple[CropSet, jnp.ndarray]:
    """Carry-independent per-frame work, vmapped over the whole sequence.

    Crop-camera generation (skinning, visibility, look-at fits) and the
    fisheye->pinhole warps don't depend on the RNN state, so instead of
    serializing them inside the scan they run for all T frames in parallel —
    this is where the tracker's wall-clock went (the per-step work is far
    too small to fill the chip; T-way batching fixes the utilization).

    The pose-independent crop-point sets (neutral/open landmarks) are
    hoisted out of the per-frame work — FK is rigid in the wrist, so per
    frame they cost one transform instead of two full skinnings.
    """
    from .crops import static_crop_points_local

    static_pts = static_crop_points_local(
        hand_model_mm, config.num_crop_points
    )
    pool = _resolved_sampler(config) == "pallas_pool"

    def per_frame(obs: FrameObservation):
        crop_set = gen_crop_set(
            rig, obs.T_world_from_camera, hand_model_mm,
            obs.gt_joint_angles, obs.gt_wrist_xfs, obs.gt_confidences,
            config, min_num_crops, static_pts,
        )
        if pool:
            # sampling deferred: only the cheap coordinate fields here
            return crop_set, _crop_coords(
                rig, obs.T_world_from_camera, crop_set, config.crop_size
            )
        crop_images = _warp_crops(
            rig, obs.images, obs.T_world_from_camera, crop_set,
            config.crop_size, sampler=config.sampler,
            use_int8=config.pallas_int8,
        )
        return crop_set, crop_images

    crop_sets, second = jax.vmap(per_frame)(seq)
    if pool:
        t = crop_sets.src_cam_idx.shape[0]
        crop_images = _pool_warp_frames(
            seq.images, second,
            crop_sets.src_cam_idx.reshape(t, -1), crop_sets.view_valid,
            use_int8=config.pallas_int8,
            sublanes=config.pool_sublanes, win_x=config.pool_win_x,
        )
        return crop_sets, crop_images
    return crop_sets, second


def _model_scan(
    model: UmeTrackNet,
    config: TrackerConfig,
    variables,
    crop_sets: CropSet,  # leaves [T, ...]
    crop_images: jnp.ndarray,  # [T, B, V, h, w]
    init_state: TrackState,
    skeleton: SkeletonInputs | None,
    hand_idx: jnp.ndarray | None = None,  # [B]
) -> Tuple[FrameResult, TrackState]:
    """Run the recurrent model over time with the backbone HOISTED out of
    the scan.

    Only the 18-channel conv-RNN memory is genuinely recurrent; everything
    else in the per-frame forward is carry-independent:

    - image features (backbone + FTL + fusion, ~99% of model FLOPs) depend
      only on that frame's crops -> one batched call over all T*B rows;
    - the memory gate ``use_memory[t] = valid[t-1] & valid[t]`` and the
      motion-compensation transform ``cam0[t-1] -> cam0[t]`` are functions
      of the (precomputed) crop trajectory, not of the carry;
    - the regressor head consumes the scanned cell's outputs -> one batched
      call over T*B afterwards.

    So the lax.scan body is just the 3x(1x1 conv) cell on [B, 6, 6, 90] —
    the MXU sees T*B-sized batches for all the heavy work instead of B-sized
    batches T times (the round-1 structure, which left the chip idle).
    Flattening is B-major so a ``data``-sharded batch axis stays the leading
    shard dim and the reshape never crosses device boundaries.
    """
    t, b = crop_images.shape[:2]
    if hand_idx is None:
        # Default only covers the single-sequence [left, right] layout; any
        # other merged batch must pass its hand pattern explicitly.
        assert b == 2, (
            f"default hand_idx assumes batch of 2 hand rows, got b={b}; "
            "pass hand_idx explicitly for merged batches"
        )
        hand_idx = jnp.arange(2, dtype=jnp.int32)

    # Dense per-frame geometry (state-independent).  use_memory inside
    # ``frames`` is an all-False placeholder — the real gate is the
    # ``use_memory`` trajectory computed below from the crop validity run;
    # extract_features ignores the field entirely.
    dummy_state = TrackState(
        temporal=init_state.temporal,
        valid_history=jnp.zeros((b,), bool),
    )
    frames = jax.vmap(
        lambda cs, im: _frame_inputs_from_crops(
            cs, im, dummy_state, enable_memory=False, hand_idx=hand_idx
        )
    )(crop_sets, crop_images)  # leaves [T, B, ...]

    # Recurrence inputs, precomputed for the whole trajectory.
    hand_valid = crop_sets.hand_valid  # [T, B]
    if config.enable_memory:
        prev_valid = jnp.concatenate(
            [init_state.valid_history[None], hand_valid[:-1]], axis=0
        )
        use_memory = prev_valid & hand_valid
    else:
        use_memory = jnp.zeros_like(hand_valid)
    cur_e = frames.extrinsics[:, :, 0].astype(jnp.float32)  # [T, B, 4, 4]
    prev_e = jnp.concatenate(
        [init_state.temporal.prev_extrinsics[None].astype(jnp.float32),
         cur_e[:-1]], axis=0,
    )
    mem_xf = memory_motion_transform(cur_e, prev_e, use_memory)  # [T,B,4,4]

    # B-major flatten helpers ([T, B, ...] <-> [B*T, ...]).
    def flat(a):
        return jnp.moveaxis(a, 0, 1).reshape(b * t, *a.shape[2:])

    def unflat(a):
        return jnp.moveaxis(a.reshape(b, t, *a.shape[1:]), 0, 1)

    # 1) image features for ALL frames in one backbone batch
    feats_flat = model.apply(
        variables, jax.tree_util.tree_map(flat, frames),
        method=UmeTrackNet.extract_features,
    )  # [B*T, h, w, C]
    feats_t = unflat(feats_flat)

    # 2) scan only the conv-RNN cell
    def body(mem, xs):
        f, xf, um = xs
        fused, new_mem = model.apply(
            variables, f, xf, um, mem, method=UmeTrackNet.temporal_step
        )
        return new_mem, fused

    mem_final, fused_t = jax.lax.scan(
        body, init_state.temporal.mem_features, (feats_t, mem_xf, use_memory)
    )

    # 3) regressor head for ALL frames in one batch
    fused_flat = flat(fused_t)
    extr0_flat = flat(frames.extrinsics[:, :, 0])
    hand_idx_flat = flat(
        jnp.broadcast_to(hand_idx[None], (t, b)).astype(jnp.int32)
    )
    if skeleton is not None:
        skel_feats = model.apply(
            variables, skeleton, method=UmeTrackNet.encode_skeleton
        )  # [Bs, h, w, C]
        if skel_feats.shape[0] == 1:
            skel_feats = jnp.broadcast_to(
                skel_feats, (b, *skel_feats.shape[1:])
            )
        skel_flat = jnp.broadcast_to(
            skel_feats[:, None], (b, t, *skel_feats.shape[1:])
        ).reshape(b * t, *skel_feats.shape[1:])
        out_flat = model.apply(
            variables, fused_flat, skel_flat, hand_idx_flat, extr0_flat,
            method=UmeTrackNet.regress_known,
        )
    else:
        out_flat = model.apply(
            variables, fused_flat, hand_idx_flat, extr0_flat,
            method=UmeTrackNet.regress_scale,
        )
    out = jax.tree_util.tree_map(unflat, out_flat)

    wrist_mm = out.wrist_xfs.at[..., :3, 3].multiply(M_TO_MM)
    results = FrameResult(
        joint_angles=out.joint_angles,
        wrist_xfs=wrist_mm,
        valid=hand_valid,
        n_views=crop_sets.n_views,
        predicted_scales=out.skel_scales,
    )
    final_state = TrackState(
        temporal=TemporalState(
            mem_features=mem_final, prev_extrinsics=cur_e[-1]
        ),
        valid_history=hand_valid[-1],
    )
    return results, final_state


def _skeleton_inputs(hand_model_mm: HandModel) -> SkeletonInputs:
    hand_model_m = scaled_hand_model(hand_model_mm, MM_TO_M)
    return SkeletonInputs(
        joint_rotation_axes=hand_model_m.joint_rotation_axes[None],
        joint_rest_positions=hand_model_m.joint_rest_positions[None],
    )


@partial(jax.jit, static_argnames=("model", "config", "min_num_crops"))
def track_sequence(
    model: UmeTrackNet,
    config: TrackerConfig,
    variables,
    rig: CameraRig,
    seq: FrameObservation,  # leading T axis on every leaf
    init_state: TrackState,
    hand_model_mm: HandModel,
    min_num_crops: int = 1,
    skel_hand_model_mm: HandModel = None,
) -> Tuple[FrameResult, TrackState]:
    """Known-skeleton tracking over a whole sequence: parallel per-frame
    prep (crops + warps) followed by a scan of the recurrent model only."""
    crop_sets, crop_images = _prepare_sequence(
        config, rig, seq, hand_model_mm, min_num_crops
    )
    skel_src = hand_model_mm if skel_hand_model_mm is None else skel_hand_model_mm
    return _model_scan(
        model, config, variables, crop_sets, crop_images, init_state,
        _skeleton_inputs(skel_src),
    )


def _prepare_sequences_merged(
    config: TrackerConfig,
    rigs: CameraRig,  # [S, ...]
    seqs: FrameObservation,  # [S, T, ...]
    hand_models_mm: HandModel,  # [S, ...]
    min_num_crops: int,
):
    """vmapped (S, T) prep, reshaped time-major with the S sequences merged
    into 2S flat hand rows for the recurrent scan.

    On the pool-sampler path the (S, T) crop GEOMETRY is vmapped but the
    sampling itself is ONE pool-kernel call over all S*T*2V warps against
    the S*T*N preprocessed source views — the pallas grid handles the
    batching, not vmap (a vmapped pallas_call would re-batch the image
    operand per warp, recreating exactly the waste this kernel removes)."""
    from .crops import static_crop_points_local

    s = rigs.fx.shape[0]
    if _resolved_sampler(config) == "pallas_pool":
        def geometry(rig, seq, hm):
            static_pts = static_crop_points_local(hm, config.num_crop_points)

            def per_frame(obs):
                crop_set = gen_crop_set(
                    rig, obs.T_world_from_camera, hm,
                    obs.gt_joint_angles, obs.gt_wrist_xfs,
                    obs.gt_confidences, config, min_num_crops, static_pts,
                )
                return crop_set, _crop_coords(
                    rig, obs.T_world_from_camera, crop_set, config.crop_size
                )

            return jax.vmap(per_frame)(seq)

        crop_sets, coords = jax.vmap(geometry)(
            rigs, seqs, hand_models_mm
        )  # leaves [S, T, ...]
        t = crop_sets.src_cam_idx.shape[1]
        n, h, w = seqs.images.shape[2:]

        def flat_ft(a):  # [S, T, ...] -> [S*T, ...]
            return a.reshape(s * t, *a.shape[2:])

        crop_images = _pool_warp_frames(
            seqs.images.reshape(s * t, n, h, w),
            flat_ft(coords),
            flat_ft(crop_sets.src_cam_idx).reshape(s * t, -1),
            flat_ft(crop_sets.view_valid),
            use_int8=config.pallas_int8,
            sublanes=config.pool_sublanes, win_x=config.pool_win_x,
        ).reshape(s, t, *crop_sets.view_valid.shape[2:], *config.crop_size)
    else:
        crop_sets, crop_images = jax.vmap(
            lambda rig, seq, hm: _prepare_sequence(
                config, rig, seq, hm, min_num_crops
            )
        )(rigs, seqs, hand_models_mm)  # leaves [S, T, 2, ...]

    # [S, T, 2, ...] -> [T, 2S, ...]
    def to_scan(a):
        a = jnp.moveaxis(a, 1, 0)  # [T, S, 2, ...]
        return a.reshape(a.shape[0], s * 2, *a.shape[3:])

    crop_sets_t = jax.tree_util.tree_map(to_scan, crop_sets)
    crop_images_t = to_scan(crop_images)
    return crop_sets_t, crop_images_t


def _merged_scan(
    model: UmeTrackNet,
    config: TrackerConfig,
    variables,
    crop_sets_t: CropSet,  # leaves [T, 2S, ...]
    crop_images_t: jnp.ndarray,
    init_state: TrackState,  # leaves [2S, ...]
    skeleton: SkeletonInputs | None,  # [2S, ...] rows or None (scale head)
    hand_idx: jnp.ndarray,  # [2S]
) -> Tuple[FrameResult, TrackState]:
    """Hoisted recurrent model over 2S merged hand rows (lax.scan returns
    (carry, ys); _model_scan returns (ys, carry) — swap)."""
    results, final_state = _model_scan(
        model, config, variables, crop_sets_t, crop_images_t, init_state,
        skeleton, hand_idx=hand_idx,
    )
    return final_state, results


@partial(jax.jit, static_argnames=("model", "config", "min_num_crops"))
def track_sequences_batched(
    model: UmeTrackNet,
    config: TrackerConfig,
    variables,
    rigs: CameraRig,  # leaves [S, ...]
    seqs: FrameObservation,  # leaves [S, T, ...] (sequence-major)
    init_state: TrackState,  # leaves [2*S, ...] (flat hand rows)
    hand_models_mm: HandModel,  # leaves [S, ...]
    min_num_crops: int = 1,
    skel_hand_models_mm: HandModel = None,
) -> Tuple[FrameResult, TrackState]:
    """Track S sequences in lock-step.

    Per-frame prep (crops + warps) is vmapped over (S, T) — fully parallel —
    and the recurrent scan runs with the S sequences *merged into the model
    batch* (2S hand rows through one backbone call), which is what actually
    fills the MXU.  Scale-out shards S over the mesh's ``data`` axis; the
    recurrence stays inside each lane (SURVEY §2.3: never split a sequence's
    time axis).  Results come back as [T, S, 2, ...].
    """
    s = rigs.fx.shape[0]
    crop_sets_t, crop_images_t = _prepare_sequences_merged(
        config, rigs, seqs, hand_models_mm, min_num_crops
    )

    skel_src = hand_models_mm if skel_hand_models_mm is None else skel_hand_models_mm
    hand_m = scaled_hand_model(skel_src, MM_TO_M)
    skeleton = SkeletonInputs(
        joint_rotation_axes=jnp.repeat(hand_m.joint_rotation_axes, 2, axis=0),
        joint_rest_positions=jnp.repeat(hand_m.joint_rest_positions, 2, axis=0),
    )
    hand_idx = jnp.tile(jnp.arange(2, dtype=jnp.int32), s)

    final_state, results = _merged_scan(
        model, config, variables, crop_sets_t, crop_images_t, init_state,
        skeleton, hand_idx,
    )
    # [T, 2S, ...] -> [T, S, 2, ...]
    results = jax.tree_util.tree_map(
        lambda a: a.reshape(a.shape[0], s, 2, *a.shape[2:]), results
    )
    return results, final_state


@partial(
    jax.jit,
    static_argnames=("model", "config", "n_calibration_samples", "min_num_crops"),
)
def calibrate_sequences_batched(
    model: UmeTrackNet,
    config: TrackerConfig,
    variables,
    rigs: CameraRig,  # leaves [S, ...]
    seqs: FrameObservation,  # leaves [S, T, ...]
    init_state: TrackState,  # leaves [2S, ...]
    hand_models_mm: HandModel,  # leaves [S, ...]
    n_calibration_samples: int = 30,
    min_num_crops: int = 2,
) -> jnp.ndarray:  # [S]
    """Unknown-skeleton pass 1 for S sequences in lock-step: the scale head
    runs on 2S merged hand rows per scan step, and each sequence averages its
    first ``n_calibration_samples`` valid predictions (frame-major, hand 0
    before hand 1 — the reference's append order,
    run_eval_unknown_skeleton.py:49-78)."""
    s = rigs.fx.shape[0]
    crop_sets_t, crop_images_t = _prepare_sequences_merged(
        config, rigs, seqs, hand_models_mm, min_num_crops
    )
    hand_idx = jnp.tile(jnp.arange(2, dtype=jnp.int32), s)
    _, results = _merged_scan(
        model, config, variables, crop_sets_t, crop_images_t, init_state,
        skeleton=None, hand_idx=hand_idx,
    )
    # [T, 2S] -> [S, T*2] frame-major, hand-minor per sequence
    scales = jnp.moveaxis(
        results.predicted_scales.reshape(-1, s, 2), 1, 0
    ).reshape(s, -1)
    valid = jnp.moveaxis(results.valid.reshape(-1, s, 2), 1, 0).reshape(s, -1)
    if n_calibration_samples:
        take = valid & (
            jnp.cumsum(valid.astype(jnp.int32), axis=1) <= n_calibration_samples
        )
    else:
        take = valid
    w = take.astype(scales.dtype)
    return jnp.sum(scales * w, axis=1) / jnp.maximum(jnp.sum(w, axis=1), 1.0)


@partial(jax.jit, static_argnames=("model", "config", "min_num_crops"))
def predict_scales_sequence(
    model: UmeTrackNet,
    config: TrackerConfig,
    variables,
    rig: CameraRig,
    seq: FrameObservation,
    init_state: TrackState,
    hand_model_mm: HandModel,
    min_num_crops: int = 2,
) -> Tuple[jnp.ndarray, jnp.ndarray, TrackState]:
    """Per-frame skeleton-scale predictions over a sequence (chunk): returns
    (scales [T, 2], valid [T, 2], final state).  The chunked building block
    of the unknown-skeleton calibration pass — callers aggregate across
    chunks host-side with bounded memory."""
    crop_sets, crop_images = _prepare_sequence(
        config, rig, seq, hand_model_mm, min_num_crops
    )
    results, state = _model_scan(
        model, config, variables, crop_sets, crop_images, init_state,
        skeleton=None,
    )
    return results.predicted_scales, results.valid, state


@partial(
    jax.jit, static_argnames=("model", "config", "n_calibration_samples")
)
def calibrate_sequence(
    model: UmeTrackNet,
    config: TrackerConfig,
    variables,
    rig: CameraRig,
    seq: FrameObservation,
    init_state: TrackState,
    hand_model_mm: HandModel,
    n_calibration_samples: int = 30,
) -> jnp.ndarray:
    """Unknown-skeleton pass 1 (run_eval_unknown_skeleton.py:49-78): predict
    per-frame skeleton scales on 2-view frames and average the first
    ``n_calibration_samples`` valid ones (0 = use all).  Returns the mean
    scale (scalar)."""
    crop_sets, crop_images = _prepare_sequence(config, rig, seq, hand_model_mm, 2)
    results, _ = _model_scan(
        model, config, variables, crop_sets, crop_images, init_state,
        skeleton=None,
    )
    scales, valid = results.predicted_scales, results.valid
    # Frame-major, hand 0 before hand 1 — the reference's append order.
    flat_scales = scales.reshape(-1)
    flat_valid = valid.reshape(-1)
    if n_calibration_samples:
        take = flat_valid & (
            jnp.cumsum(flat_valid.astype(jnp.int32)) <= n_calibration_samples
        )
    else:
        take = flat_valid
    w = take.astype(flat_scales.dtype)
    return jnp.sum(flat_scales * w) / jnp.maximum(jnp.sum(w), 1.0)


def sequence_landmarks(
    hand_model_mm: HandModel,
    joint_angles: jnp.ndarray,  # [T, 2, 22]
    wrist_xfs: jnp.ndarray,  # [T, 2, 4, 4] mm
) -> jnp.ndarray:  # [T, 2, 21, 3]
    """World landmarks for a whole tracked sequence (both hands)."""

    def per_frame(angles, wrists):
        return jax.vmap(
            lambda a, w, h: landmarks_from_pose(hand_model_mm, a, w, h)
        )(angles, wrists, jnp.arange(2, dtype=jnp.int32))

    return jax.vmap(per_frame)(joint_angles, wrist_xfs)


class HandTracker:
    """Convenience wrapper bundling model, weights and config.

    The underlying compute entry points are the free jitted functions above;
    this class mirrors the reference ``HandTracker`` surface
    (tracker.py:83-192) for familiarity.
    """

    def __init__(
        self,
        model: UmeTrackNet,
        variables,
        config: Optional[TrackerConfig] = None,
    ):
        self.model = model
        self.variables = variables
        self.config = config or TrackerConfig()

    def init_state(self) -> TrackState:
        return TrackState.init(self.model.config)

    def track_frame(
        self, rig, obs, state, hand_model_mm, min_num_crops: int = 1
    ):
        return track_frame(
            self.model, self.config, self.variables, rig, obs, state,
            hand_model_mm, min_num_crops, known=True,
        )

    def track_frame_and_calibrate_scale(
        self, rig, obs, state, hand_model_mm, min_num_crops: int = 2
    ):
        return track_frame(
            self.model, self.config, self.variables, rig, obs, state,
            hand_model_mm, min_num_crops, known=False,
        )

    def track_sequence(
        self, rig, seq, hand_model_mm, min_num_crops: int = 1,
        init_state: Optional[TrackState] = None,
        skel_hand_model_mm=None,
    ):
        return track_sequence(
            self.model, self.config, self.variables, rig, seq,
            init_state or self.init_state(), hand_model_mm, min_num_crops,
            skel_hand_model_mm,
        )

    def calibrate_sequence(
        self, rig, seq, hand_model_mm, n_calibration_samples: int = 30,
        init_state: Optional[TrackState] = None,
    ):
        return calibrate_sequence(
            self.model, self.config, self.variables, rig, seq,
            init_state or self.init_state(), hand_model_mm,
            n_calibration_samples,
        )

    def predict_scales(
        self, rig, seq, hand_model_mm, min_num_crops: int = 2,
        init_state: Optional[TrackState] = None,
    ):
        return predict_scales_sequence(
            self.model, self.config, self.variables, rig, seq,
            init_state or self.init_state(), hand_model_mm, min_num_crops,
        )

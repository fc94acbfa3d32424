"""UmeTrack model assembly: dense-batch, mask-based, state-as-carry.

Functional redesign of the reference ``lib/models/umetrack_model.py``:

- The reference's ragged ``sample_range`` (1-2 views per hand) becomes a
  dense ``[B, V=2]`` layout with an ``n_views`` count per sample.  Both the
  two-view fused path and the single-view path are computed for every sample
  through one static graph and selected by mask — no per-sample Python loop
  (umetrack_model.py:149-166's slow path disappears).
- The conv-RNN's mutable module-state memory bank (temporal.py:41-42,136-137)
  becomes an explicit ``TemporalState`` pytree threaded through the call:
  sample i uses memory row i (the caller keeps rows stable across frames,
  which is what the reference's ``memory_idx`` indirection achieved).
- All matrix inverses are closed-form (rigid or scale), never
  ``jnp.linalg.inv``.

Units contract (tracker.py:215,242): images in [0,1]; extrinsics world->eye
in meters; outputs in meters.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from ..geometry import affine
from .backbone import ResNetBackbone
from .components import (
    MultiViewFusion,
    PoseRegressor,
    RegressorOutput,
    SkeletonEncoder,
    TemporalConvStack,
)
from .config import ModelConfig
from .ftl import apply_ftl, singlev_scale_xf

NUM_VIEWS = 2


@struct.dataclass
class FrameInputs:
    """One dense batch of hand samples (a "frame" worth of crops).

    * images: [B, V, H, W] float in [0, 1] (left-hand canonical crops)
    * intrinsics: [B, V, 3, 3] crop-camera pinhole intrinsics
    * extrinsics: [B, V, 4, 4] world->eye, translation in meters.  Invalid
      view slots must still hold a finite orthonormal transform (e.g. a copy
      of view 0).
    * n_views: [B] int, 1 or 2 — valid views are packed at the front
    * hand_idx: [B] int, 0=left 1=right (right-hand wrists get x-mirrored)
    * use_memory: [B] bool — whether the temporal memory row is valid
    """

    images: jnp.ndarray
    intrinsics: jnp.ndarray
    extrinsics: jnp.ndarray
    n_views: jnp.ndarray
    hand_idx: jnp.ndarray
    use_memory: jnp.ndarray


@struct.dataclass
class SkeletonInputs:
    """Known user skeleton in meters ([Bs, 22, 3]; Bs == B or 1 shared)."""

    joint_rotation_axes: jnp.ndarray
    joint_rest_positions: jnp.ndarray


@struct.dataclass
class TemporalState:
    """Explicit conv-RNN carry; row i belongs to batch sample i."""

    mem_features: jnp.ndarray  # [B, h, w, C_mem]
    prev_extrinsics: jnp.ndarray  # [B, 4, 4] previous crop-cam0 world->eye

    @staticmethod
    def zeros(batch: int, config: ModelConfig) -> "TemporalState":
        """Zero carry. ``mem_features`` lives in the model's compute dtype so
        the scan carry type is stable under bfloat16 (the cell always emits
        mem_features in compute dtype — a different carry dtype would break
        the scan); ``prev_extrinsics`` is a rigid transform and stays float32
        regardless (pose precision)."""
        h, w = config.feature_map_size
        mem_dtype = jnp.dtype(config.compute_dtype)
        return TemporalState(
            mem_features=jnp.zeros(
                (batch, h, w, config.n_memory_channels), mem_dtype
            ),
            prev_extrinsics=jnp.broadcast_to(
                jnp.eye(4, dtype=jnp.float32), (batch, 4, 4)
            ),
        )


def _scale_xf_inverse(s: jnp.ndarray) -> jnp.ndarray:
    """Inverse of the z-scale transform produced by singlev_scale_xf."""
    return s.at[..., 2, 2].set(1.0 / s[..., 2, 2])


def memory_motion_transform(
    cur_extrinsics: jnp.ndarray,  # [..., 4, 4] f32 world->cur_cam0
    prev_extrinsics: jnp.ndarray,  # [..., 4, 4] f32 world->prev_cam0
    use_memory: jnp.ndarray,  # [...] bool
) -> jnp.ndarray:  # [..., 4, 4] prev_cam0 -> cur_cam0
    """Gated motion-compensation transform for the conv-RNN memory
    (temporal.py:51-78): rows without valid memory substitute identity for
    ``prev`` so the transform stays finite (the memory itself is zeroed by
    the gate).  Shared by the streaming step (``_temporal_features``) and the
    hoisted sequence scan (``tracker._model_scan``) so the two paths cannot
    drift apart."""
    eye = jnp.broadcast_to(
        jnp.eye(4, dtype=jnp.float32), prev_extrinsics.shape
    )
    safe_prev = jnp.where(use_memory[..., None, None], prev_extrinsics, eye)
    return cur_extrinsics @ affine.rigid_inverse(safe_prev)


def _wrist_to_world(
    cam0_extrinsics: jnp.ndarray,  # [B, 4, 4] world->cam0
    hand_idx: jnp.ndarray,  # [B]
    wrist_cam0: jnp.ndarray,  # [B, 4, 4]
) -> jnp.ndarray:
    """cam0 -> world, then mirror the x basis column for right hands
    (umetrack_model.py:77-90)."""
    world = affine.rigid_inverse(cam0_extrinsics) @ wrist_cam0
    sign = jnp.where(hand_idx == 1, -1.0, 1.0).astype(world.dtype)
    return world.at[..., :, 0].multiply(sign[:, None])


class UmeTrackNet(nn.Module):
    """Feature extractor + temporal cell + skeleton encoder + two regressors.

    Call via the named methods (``known_skeleton`` / ``predict_scale``); both
    return ``(RegressorOutput, TemporalState)``.
    """

    config: ModelConfig

    def setup(self):
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        self.backbone = ResNetBackbone(cfg, name="backbone")
        self.fusion = MultiViewFusion(
            nc_in=cfg.n_image_feature_channels * NUM_VIEWS,
            nc_out=cfg.n_image_feature_channels,
            n_blocks=cfg.n_fusion_blocks,
            dtype=dtype,
            name="fusion",
        )
        self.temporal = TemporalConvStack(
            n_channels=cfg.n_image_feature_channels + cfg.n_memory_channels,
            n_blocks=cfg.n_temporal_blocks,
            dtype=dtype,
            name="temporal",
        )
        self.skeleton_encoder = SkeletonEncoder(
            out_channels=cfg.n_skeleton_feature_channels,
            feature_map_size=cfg.feature_map_size,
            dtype=dtype,
            name="skeleton_encoder",
        )
        self.regressor_k = PoseRegressor(
            cfg, predict_skel_scale=False, dtype=dtype, name="regressor_k"
        )
        self.regressor_u = PoseRegressor(
            cfg, predict_skel_scale=True, dtype=dtype, name="regressor_u"
        )

    # ---- feature extraction -------------------------------------------------

    def _multiv_xfs(
        self, singlev_xf: jnp.ndarray, extrinsics: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Per-view scaled->canonical and canonical->cam0 transforms
        (feature_extractor.py:61-87).  Shapes [B, V, 4, 4] / [B, 4, 4]."""
        cfg = self.config
        xf0 = extrinsics[:, 0:1]
        xf_inv = affine.rigid_inverse(extrinsics)
        xf_to_world = xf_inv @ singlev_xf
        if cfg.use_unscaled_as_canonical:
            canonical_to_cam0 = jnp.broadcast_to(
                jnp.eye(4, dtype=extrinsics.dtype),
                (extrinsics.shape[0], 4, 4),
            )
            scaled_to_canonical = xf0 @ xf_to_world
        else:
            canonical_to_cam0 = singlev_xf[:, 0]
            s0_inv = _scale_xf_inverse(singlev_xf[:, 0:1])
            scaled_to_canonical = s0_inv @ xf0 @ xf_to_world
        return scaled_to_canonical, canonical_to_cam0

    def _image_features(self, frame: FrameInputs, train: bool) -> jnp.ndarray:
        """[B, V, H, W] images -> fused [B, h, w, C] features in cam0 space."""
        cfg = self.config
        b, v = frame.images.shape[:2]
        imgs = frame.images.reshape(b * v, *frame.images.shape[2:])[..., None]
        feats = self.backbone(imgs, train=train)  # [B*V, h, w, C]
        h, w, c = feats.shape[-3:]
        feats = feats.reshape(b, v, h, w, c)

        singlev_xf = singlev_scale_xf(
            frame.intrinsics, cfg.canonical_focal_length
        )  # [B, V, 4, 4]

        # Two-view fused path (feature_extractor.py:96-141)
        scaled_to_canon, canon_to_cam0 = self._multiv_xfs(
            singlev_xf, frame.extrinsics
        )
        canon_feats = apply_ftl(scaled_to_canon, feats, cfg.spatial_ftl_ratio)
        stacked = jnp.concatenate(
            [canon_feats[:, i] for i in range(v)], axis=-1
        )  # [B, h, w, V*C]
        fused = self.fusion(stacked, train=train)
        multiv_out = apply_ftl(canon_to_cam0, fused, cfg.spatial_ftl_ratio)

        # Single-view path: FTL(view0 features, S0) (feature_extractor.py:89-94)
        singlev_out = apply_ftl(
            singlev_xf[:, 0], feats[:, 0], cfg.spatial_ftl_ratio
        )

        is_multi = (frame.n_views > 1)[:, None, None, None]
        return jnp.where(is_multi, multiv_out, singlev_out)

    # ---- temporal -----------------------------------------------------------

    def temporal_step(
        self,
        img_features: jnp.ndarray,  # [B, h, w, C_img]
        mem_transform: jnp.ndarray,  # [B, 4, 4] f32 prev_cam0 -> cur_cam0
        use_memory: jnp.ndarray,  # [B] bool
        mem_features: jnp.ndarray,  # [B, h, w, C_mem]
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """One conv-RNN cell step on precomputed inputs -> (fused, new_mem).

        ``mem_transform`` is the motion-compensation transform
        (temporal.py:51-78); callers that know the whole crop-camera
        trajectory in advance (the sequence trackers) precompute it for all
        frames and scan only this cell — the backbone never enters the scan.
        """
        cfg = self.config
        # Warp math in f32, but activations back to compute dtype: the f32
        # transform would otherwise promote mem_in and the concatenated
        # temporal input, doubling activation bandwidth under bf16.
        compensated = apply_ftl(
            mem_transform, mem_features, cfg.temporal_ftl_ratio
        ).astype(mem_features.dtype)
        mem_in = jnp.where(
            use_memory[:, None, None, None],
            compensated,
            jnp.zeros_like(mem_features),
        )

        tin = jnp.concatenate([mem_in, img_features], axis=-1)
        tout = self.temporal(tin)
        new_mem = tout[..., : cfg.n_memory_channels]
        fused = tout[..., cfg.n_memory_channels:]
        return fused, new_mem

    def _temporal_features(
        self,
        img_features: jnp.ndarray,
        frame: FrameInputs,
        state: TemporalState,
    ) -> Tuple[jnp.ndarray, TemporalState]:
        """Motion-compensate memory, run the cell, emit new state
        (temporal.py:51-139)."""
        # Motion-compensation geometry always in f32 (a bf16 rigid inverse
        # drifts the memory warp); the cell itself runs in compute dtype.
        cur_e = frame.extrinsics[:, 0].astype(jnp.float32)
        use_mem = frame.use_memory
        prev_cam0_to_cur = memory_motion_transform(
            cur_e, state.prev_extrinsics, use_mem
        )
        fused, new_mem = self.temporal_step(
            img_features, prev_cam0_to_cur, use_mem, state.mem_features
        )
        return fused, TemporalState(mem_features=new_mem, prev_extrinsics=cur_e)

    # ---- output decode ------------------------------------------------------

    def _wrist_to_world(
        self, frame: FrameInputs, wrist_cam0: jnp.ndarray
    ) -> jnp.ndarray:
        """cam0 -> world, then mirror the x basis column for right hands
        (umetrack_model.py:77-90)."""
        return _wrist_to_world(
            frame.extrinsics[:, 0], frame.hand_idx, wrist_cam0
        )

    # ---- hoisted pieces (carry-independent; used by the sequence trackers) --

    def extract_features(
        self, frame: FrameInputs, train: bool = False
    ) -> jnp.ndarray:
        """Backbone + FTL + multi-view fusion only — everything in the model
        forward that does NOT depend on the recurrent state.  The sequence
        trackers run this once over all (sequence, time) rows merged into one
        batch, so the MXU sees T*B crops per backbone call instead of B."""
        return self._image_features(frame, train)

    def encode_skeleton(
        self, skeleton: SkeletonInputs, train: bool = False
    ) -> jnp.ndarray:
        """Skeleton-encoder features [Bs, h, w, C_skel] (constant over time)."""
        return self.skeleton_encoder(
            skeleton.joint_rotation_axes, skeleton.joint_rest_positions,
            train=train,
        )

    def regress_known(
        self,
        fused: jnp.ndarray,  # [B, h, w, C_img] temporal-cell output
        skel_feats: jnp.ndarray,  # [B or 1, h, w, C_skel]
        hand_idx: jnp.ndarray,  # [B]
        cam0_extrinsics: jnp.ndarray,  # [B, 4, 4] world->cam0 (meters)
        train: bool = False,
    ) -> RegressorOutput:
        """Known-skeleton regressor head on precomputed temporal features;
        batched over (sequence, time) by the sequence trackers."""
        b = fused.shape[0]
        if skel_feats.shape[0] == 1 and b > 1:
            skel_feats = jnp.broadcast_to(skel_feats, (b, *skel_feats.shape[1:]))
        x = jnp.concatenate([fused, skel_feats], axis=-1)
        out = self.regressor_k(x, train=train)
        return out.replace(
            wrist_xfs=_wrist_to_world(cam0_extrinsics, hand_idx, out.wrist_xfs)
        )

    def regress_scale(
        self,
        fused: jnp.ndarray,
        hand_idx: jnp.ndarray,
        cam0_extrinsics: jnp.ndarray,
        train: bool = False,
    ) -> RegressorOutput:
        """Scale-predicting regressor head on precomputed temporal features."""
        out = self.regressor_u(fused, train=train)
        return out.replace(
            wrist_xfs=_wrist_to_world(cam0_extrinsics, hand_idx, out.wrist_xfs)
        )

    # ---- public heads -------------------------------------------------------

    def known_skeleton(
        self,
        frame: FrameInputs,
        skeleton: SkeletonInputs,
        state: TemporalState,
        train: bool = False,
    ) -> Tuple[RegressorOutput, TemporalState]:
        """Pose regression given a calibrated skeleton
        (umetrack_model.py:188-219)."""
        img_features = self._image_features(frame, train)
        fused, new_state = self._temporal_features(img_features, frame, state)
        skel_feats = self.encode_skeleton(skeleton, train=train)
        out = self.regress_known(
            fused, skel_feats, frame.hand_idx, frame.extrinsics[:, 0],
            train=train,
        )
        return out, new_state

    def predict_scale(
        self,
        frame: FrameInputs,
        state: TemporalState,
        train: bool = False,
    ) -> Tuple[RegressorOutput, TemporalState]:
        """Pose + skeleton-scale regression without a skeleton; callers must
        supply two-view samples only (umetrack_model.py:221-242)."""
        img_features = self._image_features(frame, train)
        fused, new_state = self._temporal_features(img_features, frame, state)
        out = self.regress_scale(
            fused, frame.hand_idx, frame.extrinsics[:, 0], train=train
        )
        return out, new_state

    def __call__(
        self,
        frame: FrameInputs,
        skeleton: SkeletonInputs,
        state: TemporalState,
        train: bool = False,
    ):
        """Default entry = known-skeleton head (used for init)."""
        return self.known_skeleton(frame, skeleton, state, train=train)


def make_model(config: Optional[ModelConfig] = None) -> UmeTrackNet:
    return UmeTrackNet(config or ModelConfig())


def init_model(rng, config: Optional[ModelConfig] = None, batch: int = 2):
    """Initialize parameters (and batch stats) with dummy shapes; returns
    (model, variables)."""
    config = config or ModelConfig()
    model = make_model(config)
    h, w = config.input_size
    frame = FrameInputs(
        images=jnp.zeros((batch, NUM_VIEWS, h, w)),
        intrinsics=jnp.broadcast_to(jnp.eye(3), (batch, NUM_VIEWS, 3, 3)),
        extrinsics=jnp.broadcast_to(jnp.eye(4), (batch, NUM_VIEWS, 4, 4)),
        n_views=jnp.full((batch,), 2, dtype=jnp.int32),
        hand_idx=jnp.zeros((batch,), dtype=jnp.int32),
        use_memory=jnp.zeros((batch,), dtype=bool),
    )
    skeleton = SkeletonInputs(
        joint_rotation_axes=jnp.zeros((batch, 22, 3)),
        joint_rest_positions=jnp.zeros((batch, 22, 3)),
    )
    state = TemporalState.zeros(batch, config)
    variables = model.init(rng, frame, skeleton, state)
    # Touch the scale head too so its params exist.
    variables_u = model.init(rng, frame, state, method=UmeTrackNet.predict_scale)
    merged = {
        "params": {**variables_u["params"], **variables["params"]},
        "batch_stats": {
            **variables_u.get("batch_stats", {}),
            **variables.get("batch_stats", {}),
        },
    }
    return model, merged

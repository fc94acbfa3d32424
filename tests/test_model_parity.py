"""End-to-end model parity: converted reference weights must reproduce the
reference forward pass (known-skeleton and scale-prediction heads, multi-view
and single-view paths, temporal memory across steps)."""
import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from umetrack_tpu.models import (
    FrameInputs,
    ModelConfig,
    SkeletonInputs,
    TemporalState,
    UmeTrackNet,
    make_model,
)
from umetrack_tpu.models.convert import convert_state_dict
from umetrack_tpu.models.procrustes import procrustes_align


def _rand_rigid(rng, n, translate=0.3):
    q, _ = np.linalg.qr(rng.standard_normal((n, 3, 3)))
    det = np.linalg.det(q)
    q[..., :, 0] *= np.where(det < 0, -1.0, 1.0)[:, None]
    m = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    m[:, :3, :3] = q
    m[:, :3, 3] = rng.standard_normal((n, 3)) * translate
    return m.astype(np.float32)


def _make_inputs(rng, b=2, v=2, n_views=2):
    images = rng.uniform(0, 1, size=(b, v, 96, 96)).astype(np.float32)
    intr = np.tile(np.eye(3, dtype=np.float32), (b, v, 1, 1))
    intr[..., 0, 0] = rng.uniform(150, 300, size=(b, v))
    intr[..., 1, 1] = intr[..., 0, 0]
    intr[..., 0, 2] = 47.5
    intr[..., 1, 2] = 47.5
    extr = _rand_rigid(rng, b * v).reshape(b, v, 4, 4)
    return images, intr, extr


def _torch_frame(images, intr, extr, n_views, use_memory, hand_idx):
    from lib.models.umetrack_model import InputFrameData, InputFrameDesc

    b, v = images.shape[:2]
    if n_views == 2:
        flat = slice(None)
        sample_range = np.stack([np.arange(b) * v, np.arange(b) * v + v], axis=1)
        imgs = images.reshape(b * v, 96, 96)
        intr_f = intr.reshape(b * v, 3, 3)
        extr_f = extr.reshape(b * v, 4, 4)
    else:
        sample_range = np.stack([np.arange(b), np.arange(b) + 1], axis=1)
        imgs = images[:, 0]
        intr_f = intr[:, 0]
        extr_f = extr[:, 0]
    frame_data = InputFrameData(
        left_images=torch.from_numpy(imgs),
        intrinsics=torch.from_numpy(intr_f),
        extrinsics_xf=torch.from_numpy(extr_f),
    )
    frame_desc = InputFrameDesc(
        sample_range=torch.from_numpy(sample_range).long(),
        memory_idx=torch.arange(b).long(),
        use_memory=torch.from_numpy(use_memory),
        hand_idx=torch.from_numpy(hand_idx).long(),
    )
    return frame_data, frame_desc


def _jax_frame(images, intr, extr, n_views, use_memory, hand_idx):
    b, v = images.shape[:2]
    if n_views == 1:
        # invalid second view: zero image, copy of view-0 geometry
        images = images.copy()
        images[:, 1] = 0
        extr = extr.copy()
        extr[:, 1] = extr[:, 0]
    return FrameInputs(
        images=jnp.asarray(images),
        intrinsics=jnp.asarray(intr),
        extrinsics=jnp.asarray(extr),
        n_views=jnp.full((b,), n_views, dtype=jnp.int32),
        hand_idx=jnp.asarray(hand_idx, dtype=jnp.int32),
        use_memory=jnp.asarray(use_memory),
    )


def _skel(rng, b):
    axes = rng.standard_normal((b, 22, 3)).astype(np.float32)
    rest = (rng.standard_normal((b, 22, 3)) * 0.05).astype(np.float32)
    return axes, rest


TOL = dict(rtol=2e-3, atol=2e-3)


def test_known_skeleton_multiview_parity(reference, torch_model, flax_variables):
    from lib.models.umetrack_model import InputSkeletonData

    rng = np.random.default_rng(2)
    images, intr, extr = _make_inputs(rng)
    hand_idx = np.array([0, 1])
    use_memory = np.array([False, False])
    axes, rest = _skel(rng, 2)

    fd, fdesc = _torch_frame(images, intr, extr, 2, use_memory, hand_idx)
    skel = InputSkeletonData(
        joint_rotation_axes=torch.from_numpy(axes),
        joint_rest_positions=torch.from_numpy(rest),
    )
    with torch.no_grad():
        ref_out = torch_model.regress_pose_use_skeleton(fd, fdesc, skel)

    model = make_model()
    frame = _jax_frame(images, intr, extr, 2, use_memory, hand_idx)
    skel_j = SkeletonInputs(jnp.asarray(axes), jnp.asarray(rest))
    state = TemporalState.zeros(2, ModelConfig())
    out, _ = model.apply(
        flax_variables, frame, skel_j, state, method=UmeTrackNet.known_skeleton
    )

    np.testing.assert_allclose(
        np.asarray(out.joint_angles), ref_out.joint_angles.numpy(), **TOL
    )
    np.testing.assert_allclose(
        np.asarray(out.wrist_xfs), ref_out.wrist_xfs.numpy(), **TOL
    )
    np.testing.assert_allclose(
        np.asarray(out.landmark_uncertainty_sigmas),
        ref_out.landmark_uncertainty_sigmas.numpy(),
        **TOL,
    )


def test_temporal_memory_parity(reference, torch_model, flax_variables):
    """Two steps: second step uses motion-compensated memory."""
    from lib.models.umetrack_model import InputSkeletonData

    rng = np.random.default_rng(3)
    hand_idx = np.array([0, 1])
    axes, rest = _skel(rng, 2)
    skel_t = InputSkeletonData(
        joint_rotation_axes=torch.from_numpy(axes),
        joint_rest_positions=torch.from_numpy(rest),
    )
    skel_j = SkeletonInputs(jnp.asarray(axes), jnp.asarray(rest))

    model = make_model()
    state = TemporalState.zeros(2, ModelConfig())
    # fresh torch model memory
    torch_model._temporal._mem_features = torch.empty(0)
    torch_model._temporal._prev_extrinsics = torch.empty(0)

    for step, use_mem in enumerate([np.array([False, False]), np.array([True, True])]):
        images, intr, extr = _make_inputs(rng)
        fd, fdesc = _torch_frame(images, intr, extr, 2, use_mem, hand_idx)
        with torch.no_grad():
            ref_out = torch_model.regress_pose_use_skeleton(fd, fdesc, skel_t)
        frame = _jax_frame(images, intr, extr, 2, use_mem, hand_idx)
        out, state = model.apply(
            flax_variables, frame, skel_j, state, method=UmeTrackNet.known_skeleton
        )
        np.testing.assert_allclose(
            np.asarray(out.joint_angles), ref_out.joint_angles.numpy(), **TOL,
            err_msg=f"step {step}",
        )
        np.testing.assert_allclose(
            np.asarray(out.wrist_xfs), ref_out.wrist_xfs.numpy(), **TOL,
            err_msg=f"step {step}",
        )


def test_singleview_parity(reference, torch_model, flax_variables):
    from lib.models.umetrack_model import InputSkeletonData

    rng = np.random.default_rng(4)
    images, intr, extr = _make_inputs(rng)
    hand_idx = np.array([0, 1])
    use_memory = np.array([False, False])
    axes, rest = _skel(rng, 2)

    torch_model._temporal._mem_features = torch.empty(0)
    torch_model._temporal._prev_extrinsics = torch.empty(0)

    fd, fdesc = _torch_frame(images, intr, extr, 1, use_memory, hand_idx)
    skel_t = InputSkeletonData(
        joint_rotation_axes=torch.from_numpy(axes),
        joint_rest_positions=torch.from_numpy(rest),
    )
    with torch.no_grad():
        ref_out = torch_model.regress_pose_use_skeleton(fd, fdesc, skel_t)

    model = make_model()
    frame = _jax_frame(images, intr, extr, 1, use_memory, hand_idx)
    out, _ = model.apply(
        flax_variables,
        frame,
        SkeletonInputs(jnp.asarray(axes), jnp.asarray(rest)),
        TemporalState.zeros(2, ModelConfig()),
        method=UmeTrackNet.known_skeleton,
    )
    np.testing.assert_allclose(
        np.asarray(out.joint_angles), ref_out.joint_angles.numpy(), **TOL
    )
    np.testing.assert_allclose(
        np.asarray(out.wrist_xfs), ref_out.wrist_xfs.numpy(), **TOL
    )


def test_predict_scale_parity(reference, torch_model, flax_variables):
    rng = np.random.default_rng(5)
    images, intr, extr = _make_inputs(rng)
    hand_idx = np.array([0, 1])
    use_memory = np.array([False, False])

    torch_model._temporal._mem_features = torch.empty(0)
    torch_model._temporal._prev_extrinsics = torch.empty(0)

    fd, fdesc = _torch_frame(images, intr, extr, 2, use_memory, hand_idx)
    with torch.no_grad():
        ref_out = torch_model.regress_pose_pred_skel_scale(fd, fdesc)

    model = make_model()
    frame = _jax_frame(images, intr, extr, 2, use_memory, hand_idx)
    out, _ = model.apply(
        flax_variables, frame, TemporalState.zeros(2, ModelConfig()),
        method=UmeTrackNet.predict_scale,
    )
    np.testing.assert_allclose(
        np.asarray(out.skel_scales), ref_out.skel_scales.numpy(), **TOL
    )
    np.testing.assert_allclose(
        np.asarray(out.joint_angles), ref_out.joint_angles.numpy(), **TOL
    )
    np.testing.assert_allclose(
        np.asarray(out.wrist_xfs), ref_out.wrist_xfs.numpy(), **TOL
    )


def test_procrustes_parity(reference):
    from lib.models.model_utils import procrustes_align as ref_procrustes

    rng = np.random.default_rng(6)
    from_pts = rng.standard_normal((8, 7, 3)).astype(np.float32)
    to_pts = rng.standard_normal((8, 7, 3)).astype(np.float32)
    ref = ref_procrustes(
        torch.from_numpy(from_pts), torch.from_numpy(to_pts)
    ).numpy()
    ours = np.asarray(procrustes_align(jnp.asarray(from_pts), jnp.asarray(to_pts)))
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)

    # Exact-recovery sanity: to = R @ from + t must be recovered.
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    t = rng.standard_normal(3)
    to_exact = from_pts[:1] @ q.T + t
    xf = np.asarray(
        procrustes_align(jnp.asarray(from_pts[:1]), jnp.asarray(to_exact.astype(np.float32)))
    )[0]
    np.testing.assert_allclose(xf[:3, :3], q, atol=1e-4)
    np.testing.assert_allclose(xf[:3, 3], t, atol=1e-4)

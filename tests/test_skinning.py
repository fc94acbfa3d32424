"""Parity tests: FK + LBS skinning vs. the reference torch implementation."""
import numpy as np
import jax.numpy as jnp
import torch

from umetrack_tpu.kinematics import hand as hand_mod
from umetrack_tpu.kinematics import skinning


def _ref_hand(reference, generic_hand_model_dict):
    # Equivalent of video_pose_data.load_hand_model_from_dict, inlined because
    # that module imports `av` which is unavailable in this environment.
    from lib.common.hand import HandModel as RefHandModel

    return RefHandModel(
        **{
            k: torch.Tensor(v) if isinstance(v, list) else v
            for k, v in generic_hand_model_dict.items()
        }
    )


def _our_hand(generic_hand_model_dict):
    return hand_mod.from_dict(generic_hand_model_dict)


def _rand_pose(rng, batch=()):
    angles = rng.uniform(-0.8, 0.8, size=(*batch, 22)).astype(np.float32)
    q, _ = np.linalg.qr(rng.standard_normal((*batch, 3, 3)))
    det = np.linalg.det(q)
    q[..., :, 0] *= np.where(det < 0, -1.0, 1.0)[..., None]
    wrist = np.zeros((*batch, 4, 4), dtype=np.float32)
    wrist[..., :3, :3] = q
    wrist[..., :3, 3] = rng.standard_normal((*batch, 3)) * 100
    wrist[..., 3, 3] = 1.0
    return angles, wrist


def test_skin_landmarks_unbatched(reference, generic_hand_model_dict):
    from lib.common.hand_skinning import skin_landmarks as ref_skin

    rng = np.random.default_rng(0)
    angles, wrist = _rand_pose(rng)
    ref = ref_skin(
        _ref_hand(reference, generic_hand_model_dict),
        torch.from_numpy(angles),
        torch.from_numpy(wrist),
    ).numpy()
    ours = np.asarray(
        skinning.skin_landmarks(
            _our_hand(generic_hand_model_dict), jnp.asarray(angles), jnp.asarray(wrist)
        )
    )
    assert ref.shape == (21, 3)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


def test_skin_landmarks_batched(reference, generic_hand_model_dict):
    from lib.common.hand_skinning import skin_landmarks as ref_skin
    from lib.data_utils import bundles

    rng = np.random.default_rng(1)
    batch = (4, 3)
    angles, wrist = _rand_pose(rng, batch)

    ref_hand = _ref_hand(reference, generic_hand_model_dict)
    # The reference requires the hand model batched to match leading dims.
    ref_hand_b = bundles.map_fields(
        lambda t: t.expand(*batch, *t.shape), ref_hand, only_type=torch.Tensor
    )
    ref = ref_skin(
        ref_hand_b, torch.from_numpy(angles), torch.from_numpy(wrist)
    ).numpy()

    ours = np.asarray(
        skinning.skin_landmarks(
            _our_hand(generic_hand_model_dict), jnp.asarray(angles), jnp.asarray(wrist)
        )
    )
    assert ours.shape == (*batch, 21, 3)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


def test_mirrored_hand_model(reference, generic_hand_model_dict):
    from lib.common.hand import mirrored_hand_model as ref_mirror
    from lib.data_utils import bundles

    ref_hand = _ref_hand(reference, generic_hand_model_dict)
    ref_hand_b = bundles.map_fields(
        lambda t: t.unsqueeze(0).repeat(2, *([1] * t.dim())),
        ref_hand,
        only_type=torch.Tensor,
    )
    mask = torch.tensor([False, True])
    ref_m = ref_mirror(ref_hand_b, mask)

    ours = _our_hand(generic_hand_model_dict)
    ours_b = jnp.stack
    import jax

    ours_b = jax.tree_util.tree_map(
        lambda a: None if a is None else jnp.stack([a, a]), ours
    )
    ours_m = hand_mod.mirrored_hand_model(ours_b, jnp.asarray([False, True]))

    np.testing.assert_allclose(
        np.asarray(ours_m.joint_rotation_axes),
        ref_m.joint_rotation_axes.numpy(),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(ours_m.joint_rest_positions),
        ref_m.joint_rest_positions.numpy(),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(ours_m.landmark_rest_positions),
        ref_m.landmark_rest_positions.numpy(),
        rtol=1e-6,
    )


def test_scaled_hand_model(generic_hand_model_dict):
    ours = _our_hand(generic_hand_model_dict)
    scaled = hand_mod.scaled_hand_model(ours, 0.001)
    np.testing.assert_allclose(
        np.asarray(scaled.joint_rest_positions),
        np.asarray(ours.joint_rest_positions) * 0.001,
        rtol=1e-6,
    )
    # Axes untouched
    np.testing.assert_allclose(
        np.asarray(scaled.joint_rotation_axes),
        np.asarray(ours.joint_rotation_axes),
    )


def test_neutral_angles_within_limits(generic_hand_model_dict):
    ours = _our_hand(generic_hand_model_dict)
    neutral = np.asarray(hand_mod.neutral_joint_angles(ours))
    lim = np.asarray(ours.joint_limits)
    assert np.all(neutral >= np.minimum(lim[:, 0], lim[:, 1]) - 1e-6)
    assert np.all(neutral <= np.maximum(lim[:, 0], lim[:, 1]) + 1e-6)

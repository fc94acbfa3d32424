"""bfloat16 compute mode: runs, finite, and close to the f32 forward."""
import numpy as np
import jax
import jax.numpy as jnp

from umetrack_tpu.models import (
    FrameInputs,
    ModelConfig,
    SkeletonInputs,
    TemporalState,
    UmeTrackNet,
    init_model,
    make_model,
)


def test_bf16_forward_close_to_f32():
    rng = np.random.default_rng(0)
    cfg32 = ModelConfig()
    model32, variables = init_model(jax.random.PRNGKey(0), cfg32)

    cfg16 = ModelConfig(compute_dtype="bfloat16")
    model16 = make_model(cfg16)

    b = 2
    intr = np.tile(np.eye(3, dtype=np.float32), (b, 2, 1, 1))
    intr[..., 0, 0] = intr[..., 1, 1] = 200.0
    intr[..., 0, 2] = intr[..., 1, 2] = 47.5
    frame = FrameInputs(
        images=jnp.asarray(rng.uniform(0, 1, (b, 2, 96, 96)), jnp.float32),
        intrinsics=jnp.asarray(intr),
        extrinsics=jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (b, 2, 4, 4)),
        n_views=jnp.full((b,), 2, jnp.int32),
        hand_idx=jnp.asarray([0, 1], jnp.int32),
        use_memory=jnp.zeros((b,), bool),
    )
    skel = SkeletonInputs(
        jnp.asarray(rng.standard_normal((b, 22, 3)), jnp.float32),
        jnp.asarray(rng.standard_normal((b, 22, 3)) * 0.05, jnp.float32),
    )
    state = TemporalState.zeros(b, cfg32)

    out32, _ = model32.apply(
        variables, frame, skel, state, method=UmeTrackNet.known_skeleton
    )
    out16, _ = model16.apply(
        variables, frame, skel, state, method=UmeTrackNet.known_skeleton
    )

    assert out16.joint_angles.dtype == jnp.float32  # decoded in f32
    assert np.isfinite(np.asarray(out16.joint_angles)).all()
    assert np.isfinite(np.asarray(out16.wrist_xfs)).all()
    # bf16 through ~20 conv layers: expect small but nonzero drift
    np.testing.assert_allclose(
        np.asarray(out16.joint_angles),
        np.asarray(out32.joint_angles),
        atol=0.08,
    )
    # rotations stay orthonormal
    r = np.asarray(out16.wrist_xfs)[:, :3, :3]
    np.testing.assert_allclose(
        r @ r.transpose(0, 2, 1), np.tile(np.eye(3), (b, 1, 1)), atol=1e-3
    )

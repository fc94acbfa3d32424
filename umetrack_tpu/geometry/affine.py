"""Affine / rotation utilities in pure jnp (vmappable, jit-safe).

Covers the capabilities of the reference ``lib/common/affine.py`` (see
/root/reference/lib/common/affine.py:11-66) redesigned for JAX: every function
is shape-polymorphic over leading batch dims, uses no Python control flow on
traced values, and closed-form Rodrigues replaces scipy/pytorch3d rotations.
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS_NORM = 5.43e-20  # matches reference normalized() epsilon (affine.py:22)


def transform_vec3(m: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate 3-vectors ``v [..., 3]`` by the upper-left 3x3 of ``m [..., 4, 4]``."""
    return jnp.einsum("...ij,...j->...i", m[..., :3, :3], v)


def transform3(m: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Apply a full affine transform ``m [..., 4, 4]`` to points ``v [..., 3]``."""
    return transform_vec3(m, v) + m[..., :3, 3]


def normalized(v: jnp.ndarray, axis: int = -1, eps: float = _EPS_NORM) -> jnp.ndarray:
    d = jnp.maximum(eps, jnp.sum(v * v, axis=axis, keepdims=True) ** 0.5)
    return v / d


def skew_matrix(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric cross-product matrix for ``v [..., 3]`` -> ``[..., 3, 3]``."""
    zero = jnp.zeros_like(v[..., 0])
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    rows = [
        jnp.stack([zero, -z, y], axis=-1),
        jnp.stack([z, zero, -x], axis=-1),
        jnp.stack([-y, x, zero], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def rodrigues(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle ``[..., 3]`` -> rotation matrix ``[..., 3, 3]``.

    Closed-form exponential map, replacing pytorch3d's ``so3_exp_map`` used by
    the reference skinning (hand_skinning.py:46).  Small angles use a Taylor
    expansion so the map is smooth and NaN-free at zero.
    """
    theta2 = jnp.sum(axis_angle * axis_angle, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-30))
    small = theta2 < 1e-12
    # sin(t)/t and (1-cos t)/t^2 with Taylor fallbacks.
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, 1e-30))
    k = skew_matrix(axis_angle)
    k2 = jnp.einsum("...ij,...jk->...ik", k, k)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axis_angle.dtype), k.shape)
    return eye + a[..., None, None] * k + b[..., None, None] * k2


def from_two_vectors(a_orig: jnp.ndarray, b_orig: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix aligning ``a`` onto ``b`` (both ``[..., 3]``).

    Same Rodrigues construction as the reference (affine.py:34-44); degenerate
    anti-parallel input is the caller's responsibility, as there.
    """
    a = normalized(a_orig)
    b = normalized(b_orig)
    v = jnp.cross(a, b)
    s2 = jnp.sum(v * v, axis=-1)
    c = jnp.sum(a * b, axis=-1)
    vm = skew_matrix(v)
    vm2 = jnp.einsum("...ij,...jk->...ik", vm, vm)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=a.dtype), vm.shape)
    scale = (1.0 - c) / jnp.maximum(s2, 1e-15)
    return eye + vm + vm2 * scale[..., None, None]


def rot_z(angle_deg: jnp.ndarray) -> jnp.ndarray:
    """Rotation about +z by ``angle_deg`` degrees -> ``[..., 3, 3]``."""
    t = jnp.deg2rad(angle_deg)
    c, s = jnp.cos(t), jnp.sin(t)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    rows = [
        jnp.stack([c, -s, zero], axis=-1),
        jnp.stack([s, c, zero], axis=-1),
        jnp.stack([zero, zero, one], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def rigid_inverse(m: jnp.ndarray) -> jnp.ndarray:
    """Invert ``[..., 4, 4]`` transforms whose 3x3 block is orthogonal.

    Valid for rigid transforms and for x-mirrored rigid transforms (det -1),
    both of which appear in crop-camera generation (crop.py:63-66).
    """
    r = m[..., :3, :3]
    t = m[..., :3, 3]
    rt = jnp.swapaxes(r, -1, -2)
    new_t = -jnp.einsum("...ij,...j->...i", rt, t)
    out = jnp.zeros_like(m)
    out = out.at[..., :3, :3].set(rt)
    out = out.at[..., :3, 3].set(new_t)
    out = out.at[..., 3, 3].set(1.0)
    return out


def make_look_at_matrix(
    orig_world_to_eye: jnp.ndarray,
    center: jnp.ndarray,
    camera_angle_deg: jnp.ndarray | float = 0.0,
) -> jnp.ndarray:
    """Re-aim a camera at ``center`` and roll it by ``camera_angle_deg``.

    Port of the reference semantics (affine.py:47-66): keep the camera
    position, rotate the optical axis onto the direction of ``center``, then
    roll about the new axis.  Returns the new world-to-eye transform.
    """
    center_local = transform3(orig_world_to_eye, center)
    z_dir_local = normalized(center_local)
    z_axis = jnp.zeros_like(z_dir_local).at[..., 2].set(1.0)
    delta_r_local = from_two_vectors(z_axis, z_dir_local)

    orig_eye_to_world = rigid_inverse(orig_world_to_eye)
    angle = jnp.asarray(camera_angle_deg, dtype=orig_world_to_eye.dtype)
    new_rot = (
        orig_eye_to_world[..., :3, :3] @ delta_r_local @ rot_z(angle)
    )
    new_eye_to_world = orig_eye_to_world.at[..., :3, :3].set(new_rot)
    return rigid_inverse(new_eye_to_world)

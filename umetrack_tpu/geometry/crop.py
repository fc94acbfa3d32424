"""Crop-camera fitting: aim a synthetic pinhole camera at a point cloud.

Reimplements the semantics of the reference ``lib/common/crop.py:15-82``
(look-at re-aim, optional x-mirror for right hands, focal fit so all points
project in-bounds with the -0.5-pixel-center convention, focal_multiplier
margin) as a pure, vmappable jnp function.  Where the reference raises
ValueError on degenerate geometry (points behind camera / focal < 5,
crop.py:25-26), we return a validity flag instead so the whole tracker stays
inside jit.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import struct

from . import affine


@struct.dataclass
class CropCamera:
    """A fitted pinhole crop camera plus a validity flag."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    T_world_from_eye: jnp.ndarray  # [..., 4, 4]
    valid: jnp.ndarray  # [...] bool

    def intrinsics_matrix(self) -> jnp.ndarray:
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        rows = [
            jnp.stack([self.fx, z, self.cx], axis=-1),
            jnp.stack([z, self.fy, self.cy], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ]
        return jnp.stack(rows, axis=-2)


def gen_crop_camera_from_points(
    T_world_from_eye_orig: jnp.ndarray,
    pts_world: jnp.ndarray,
    image_size: Tuple[int, int],
    mirror_img_x: jnp.ndarray,
    camera_angle_deg: jnp.ndarray | float = 0.0,
    focal_multiplier: float = 0.95,
    min_focal: float = 5.0,
) -> CropCamera:
    """Fit a crop camera enclosing ``pts_world [N, 3]``.

    Args:
      T_world_from_eye_orig: [4, 4] pose of the original camera (position kept).
      pts_world: [N, 3] points that must project inside the crop.
      image_size: (width, height) of the crop, static.
      mirror_img_x: bool scalar (traced ok) — x-flip for right hands.
      camera_angle_deg: physical mounting roll of the original camera.
      focal_multiplier: <1 zooms out slightly, leaving a margin.

    Vmap over leading dims for batches of hands/views.
    """
    orig_world_to_eye = affine.rigid_inverse(T_world_from_eye_orig)
    crop_center = (
        jnp.min(pts_world, axis=0) + jnp.max(pts_world, axis=0)
    ) / 2.0
    new_world_to_eye = affine.make_look_at_matrix(
        orig_world_to_eye, crop_center, camera_angle_deg
    )
    mirror = jnp.where(
        jnp.asarray(mirror_img_x),
        jnp.diag(jnp.asarray([-1.0, 1.0, 1.0, 1.0], dtype=new_world_to_eye.dtype)),
        jnp.eye(4, dtype=new_world_to_eye.dtype),
    )
    new_world_to_eye = mirror @ new_world_to_eye

    pts_eye = affine.transform3(new_world_to_eye, pts_world)
    z = pts_eye[..., 2]
    # -0.5-pixel-center convention: principal point at (size-1)/2 and focal
    # fit against it (reference crop.py:20-22).
    img_size = jnp.asarray(image_size, dtype=pts_eye.dtype)
    cx_cy = (img_size - 1.0) / 2.0
    # Guard the projective division so degenerate geometry (which the valid
    # flag already rejects: it requires z >= 1e-4) yields finite garbage
    # instead of NaN that would poison masked lanes downstream.
    safe_z = jnp.where(jnp.abs(pts_eye[..., 2:3]) < 1e-6, 1.0, pts_eye[..., 2:3])
    ndc = pts_eye[..., 0:2] / safe_z
    max_ndc = jnp.max(jnp.abs(ndc))
    fx_fy = cx_cy / jnp.maximum(max_ndc, 1e-12)

    valid = jnp.all(z >= 1e-4) & jnp.all(fx_fy >= min_focal)
    fx_fy = focal_multiplier * fx_fy

    return CropCamera(
        fx=fx_fy[0],
        fy=fx_fy[1],
        cx=cx_cy[0],
        cy=cx_cy[1],
        T_world_from_eye=affine.rigid_inverse(new_world_to_eye),
        valid=valid,
    )

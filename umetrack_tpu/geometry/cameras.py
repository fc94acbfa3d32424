"""Camera models as structs-of-arrays (registered pytrees), pure jnp.

TPU-first redesign of the reference camera class hierarchy
(/root/reference/lib/common/camera.py:164-331): instead of Python objects
holding scalars, each camera type is a flax.struct dataclass whose fields are
arrays with arbitrary leading batch shape, so cameras vmap/shard/scan like any
other data.  Forward (project) paths support full fisheye62 distortion;
unprojection is pinhole-only, matching the reference contract
(camera.py:278-281).

Conventions (same as reference camera.py:144-161):
- ``v``: 3D point/direction in eye space
- ``p``: projected uv, ``q``: distorted uv, ``w``: window (pixel) coords
- window = q * f + c ; pixel centers at integer coordinates
"""
from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np
from flax import struct

from . import affine


def perspective_project(v: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] eye points -> [..., 2] uv on the z=1 plane."""
    return v[..., :2] / v[..., 2:3]


def perspective_unproject(p: jnp.ndarray) -> jnp.ndarray:
    """[..., 2] uv -> [..., 3] unit-length eye ray; project∘unproject == id."""
    ones = jnp.ones_like(p[..., :1])
    v = jnp.concatenate([p, ones], axis=-1)
    return affine.normalized(v)


def arctan_project(v: jnp.ndarray, eps: float = 1e-18) -> jnp.ndarray:
    """Equidistant fisheye projection (reference camera.py:78-85).

    The guard epsilon must stay a *normal* float32: the reference's 2**-128
    is subnormal in f32 and flushes to zero on TPU, turning the on-axis point
    (r == 0) into 0/0 = NaN.  With eps = 1e-18 the r -> 0 limit is exact
    (uv -> 0) and any r > eps is unaffected.
    """
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    r = jnp.sqrt(x * x + y * y)
    s = jnp.arctan2(r, z) / jnp.maximum(r, eps)
    return jnp.stack([x * s, y * s], axis=-1)


def arctan_unproject(uv: jnp.ndarray) -> jnp.ndarray:
    """Inverse equidistant fisheye (reference camera.py:87-94)."""
    u, v = uv[..., 0], uv[..., 1]
    r = jnp.sqrt(u * u + v * v)
    c = jnp.cos(r)
    s = jnp.sinc(r / jnp.pi)
    return jnp.stack([u * s, v * s, c], axis=-1)


def fisheye62_distort(coeffs: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """6-radial + 2-tangential distortion polynomial.

    ``coeffs [..., 8]`` ordered (k1 k2 k3 k4 p1 p2 k5 k6), identical to the
    reference parameter order (camera.py:106-141). ``p [..., 2]``.
    """
    k1, k2, k3, k4 = (coeffs[..., i] for i in range(4))
    p1, p2 = coeffs[..., 4], coeffs[..., 5]
    k5, k6 = coeffs[..., 6], coeffs[..., 7]

    r2 = jnp.sum(p * p, axis=-1)
    r2 = jnp.clip(r2, -jnp.pi ** 2, jnp.pi ** 2)
    r4 = r2 * r2
    r6 = r2 * r4
    r8 = r4 * r4
    r10 = r4 * r6
    r12 = r6 * r6
    radial = 1 + k1 * r2 + k2 * r4 + k3 * r6 + k4 * r8 + k5 * r10 + k6 * r12
    uv = p * radial[..., None]

    x, y = uv[..., 0], uv[..., 1]
    x2, y2, xy = x * x, y * y, x * y
    r2t = x2 + y2
    xd = x + 2 * p2 * xy + p1 * (r2t + 2 * x2)
    yd = y + 2 * p1 * xy + p2 * (r2t + 2 * y2)
    return jnp.stack([xd, yd], axis=-1)


class _CameraOps:
    """Shared rigid-transform helpers; ``T_world_from_eye [..., 4, 4]``."""

    def world_to_eye(self, p_world: jnp.ndarray) -> jnp.ndarray:
        t = self.T_world_from_eye
        return affine.transform_vec3(
            jnp.swapaxes(t, -1, -2), p_world - t[..., :3, 3]
        )

    def eye_to_world(self, v_eye: jnp.ndarray) -> jnp.ndarray:
        return affine.transform3(self.T_world_from_eye, v_eye)

    def world_to_window(self, p_world: jnp.ndarray) -> jnp.ndarray:
        return self.eye_to_window(self.world_to_eye(p_world))

    @property
    def f(self) -> jnp.ndarray:
        return jnp.stack([self.fx, self.fy], axis=-1)

    @property
    def c(self) -> jnp.ndarray:
        return jnp.stack([self.cx, self.cy], axis=-1)


@struct.dataclass
class PinholeCamera(_CameraOps):
    """Distortion-free perspective camera (reference PinholePlaneCameraModel)."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    width: jnp.ndarray
    height: jnp.ndarray
    T_world_from_eye: jnp.ndarray

    def eye_to_window(self, v_eye: jnp.ndarray) -> jnp.ndarray:
        """Project eye points to pixel coords.

        Camera batch dims must broadcast against the point batch dims (an
        unbatched camera projects any [..., 3] point set; batched cameras are
        used via vmap).
        """
        p = perspective_project(v_eye)
        return p * self.f + self.c

    def window_to_eye(self, w: jnp.ndarray) -> jnp.ndarray:
        q = (w - self.c) / self.f
        return perspective_unproject(q)

    def uv_to_window_matrix(self) -> jnp.ndarray:
        """3x3 intrinsics matrix (reference camera.py:323-327)."""
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        rows = [
            jnp.stack([self.fx, z, self.cx], axis=-1),
            jnp.stack([z, self.fy, self.cy], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ]
        return jnp.stack(rows, axis=-2)


@struct.dataclass
class Fisheye62Camera(_CameraOps):
    """Fisheye camera: arctan projection + 6-radial/2-tangential distortion."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    width: jnp.ndarray
    height: jnp.ndarray
    T_world_from_eye: jnp.ndarray
    coeffs: jnp.ndarray  # [..., 8] = (k1 k2 k3 k4 p1 p2 k5 k6)

    def eye_to_window(self, v_eye: jnp.ndarray) -> jnp.ndarray:
        p = arctan_project(v_eye)
        q = fisheye62_distort(self.coeffs, p)
        return q * self.f + self.c


def camera_from_json(js: Dict[str, Any], T_world_from_eye: np.ndarray | None = None):
    """Build a camera from the reference JSON schema (camera.py:334-355)."""
    if "Camera" in js:
        js = js["Camera"]
    common = dict(
        fx=jnp.asarray(float(js["fx"])),
        fy=jnp.asarray(float(js["fy"])),
        cx=jnp.asarray(float(js["cx"])),
        cy=jnp.asarray(float(js["cy"])),
        width=jnp.asarray(float(js["ImageSizeX"])),
        height=jnp.asarray(float(js["ImageSizeY"])),
        T_world_from_eye=jnp.asarray(
            np.eye(4, dtype=np.float32) if T_world_from_eye is None else T_world_from_eye,
            dtype=jnp.float32,
        ),
    )
    model = js["DistortionModel"]
    if model == "PinholePlane":
        return PinholeCamera(**common)
    if model == "FishEye62":
        names = ("k1", "k2", "k3", "k4", "p1", "p2", "k5", "k6")
        coeffs = jnp.asarray([float(js[n]) for n in names])
        return Fisheye62Camera(coeffs=coeffs, **common)
    raise ValueError(f"unknown DistortionModel: {model}")

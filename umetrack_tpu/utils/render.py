"""Capsule ray-traced hand renderer (JAX, runs on the accelerator).

Round-4 diagnosis (RESULTS.md): with flat cv2 stroke rendering the model
memorized train sequences (angles-only 2.2 mm) but could not READ finger
articulation from held-out pixels (15.2 mm / ~14.4 deg MPJPA) — the stroke
domain under-determines per-finger pose at 96x96 crop resolution.  This
renderer replaces the strokes with a proper 3-D shaded model:

- every hand is a soup of capsules around its skinned bone segments (the
  same 21-segment topology the stroke renderer used, with anatomical radii),
- each pixel's camera ray (fisheye62 unprojection, precomputed per camera)
  is intersected against ALL capsules of BOTH hands — a shared z-buffer, so
  self-occlusion between fingers and mutual occlusion between hands are
  geometrically exact,
- hits are Lambert + Blinn-Phong shaded with a per-sequence random light,
  plus a mild depth cue, so the surface ORIENTATION of every finger segment
  is visible in the mono image — exactly the angle cue flat strokes lack.

The tracer is pure jnp (scan over capsules, vmap over cameras, lax.map over
frames) so sequence rendering runs on the TPU chip next to the tracker prep
that consumes it; only the uint8 frames travel to the host.

No reference counterpart exists (the reference ships no synthetic data
generation); the capsule topology mirrors utils/synthetic._BONES and the
landmark order of /root/reference/lib/common/hand.py:24-45.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

BIG = 1e9

# Bone segments between landmarks, identical topology to synthetic._BONES:
# thumb chain, 4 fingers x 4 segments, wrist->palm.  Landmark order is the
# reference LANDMARK enum (hand.py:24-45): 0-4 fingertips, 5 wrist, 6-7
# thumb frames, 8-19 finger frames, 20 palm center.
BONES = (
    (5, 6), (6, 7), (7, 0),
    (5, 8), (8, 9), (9, 10), (10, 1),
    (5, 11), (11, 12), (12, 13), (13, 2),
    (5, 14), (14, 15), (15, 16), (16, 3),
    (5, 17), (17, 18), (18, 19), (19, 4),
    (5, 20),
)
# Capsule radii (mm): half the stroke widths the 2-D renderer used
# (synthetic._BONE_WIDTH_MM), which were themselves anatomical diameters.
BONE_RADIUS_MM = (
    11.0, 9.0, 7.5,
    8.5, 7.5, 6.5, 5.5,
    9.0, 8.0, 7.0, 6.0,
    8.5, 7.5, 6.5, 5.5,
    7.0, 6.0, 5.5, 5.0,
    17.0,
)
# Per-bone albedo in [0, 1]: one band per finger (the stroke renderer's
# _BONE_GRAY), so digits stay visually distinguishable in mono.
BONE_ALBEDO = tuple(
    g / 255.0
    for g in (
        150, 150, 150,
        170, 170, 170, 170,
        190, 190, 190, 190,
        210, 210, 210, 210,
        230, 230, 230, 230,
        140,
    )
)


@lru_cache(maxsize=16)
def _fisheye_ray_grid_cached(params: tuple, h: int, w: int) -> np.ndarray:
    (fx, fy, cx, cy, k1, k2, k3, k4, p1, p2, k5, k6) = params

    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    qx = (xs - cx) / fx
    qy = (ys - cy) / fy
    q = np.stack([qx, qy], axis=-1)  # distorted normalized coords

    # Invert the forward model (geometry/cameras.py fisheye62_distort,
    # reference camera.py:106-141): forward is uv = u * radial(|u|^2), then
    # xd = uv + tangential(uv).  Inverse in two stages:
    # 1) tangential by fixed point (p1/p2 are ~1e-4 — contraction is fast):
    uv = q.copy()
    for _ in range(8):
        ux, uy = uv[..., 0], uv[..., 1]
        r2t = ux * ux + uy * uy
        tx = 2 * p2 * ux * uy + p1 * (r2t + 2 * ux * ux)
        ty = 2 * p1 * ux * uy + p2 * (r2t + 2 * uy * uy)
        uv = q - np.stack([tx, ty], axis=-1)
    # 2) radial by scalar Newton on the monotone g(s) = s * radial(s^2) = m
    # (plain fixed-point diverges where radial >> 1 — the outer 18% of the
    # image at these coefficients):
    m = np.linalg.norm(uv, axis=-1)
    s = np.minimum(m, 1.5)
    for _ in range(30):
        s2 = s * s
        radial = (
            1 + k1 * s2 + k2 * s2 ** 2 + k3 * s2 ** 3 + k4 * s2 ** 4
            + k5 * s2 ** 5 + k6 * s2 ** 6
        )
        dradial = (
            k1 + 2 * k2 * s2 + 3 * k3 * s2 ** 2 + 4 * k4 * s2 ** 3
            + 5 * k5 * s2 ** 4 + 6 * k6 * s2 ** 5
        )
        g = s * radial - m
        gp = radial + 2 * s2 * dradial
        s = np.clip(s - g / np.where(np.abs(gp) > 1e-9, gp, 1.0), 0.0, np.pi)
    with np.errstate(invalid="ignore"):
        u = uv * np.where(m > 1e-12, s / np.maximum(m, 1e-12), 0.0)[..., None]

    # convergence check through the forward model
    r2 = np.clip(np.sum(u * u, axis=-1), 0.0, np.pi ** 2)
    radial = (
        1 + k1 * r2 + k2 * r2 ** 2 + k3 * r2 ** 3 + k4 * r2 ** 4
        + k5 * r2 ** 5 + k6 * r2 ** 6
    )
    ux, uy = u[..., 0] * radial, u[..., 1] * radial
    r2t = ux * ux + uy * uy
    fwd = np.stack(
        [
            ux + 2 * p2 * ux * uy + p1 * (r2t + 2 * ux * ux),
            uy + 2 * p1 * ux * uy + p2 * (r2t + 2 * uy * uy),
        ],
        axis=-1,
    )
    ok = np.linalg.norm(fwd - q, axis=-1) < 1e-6

    # u is the arctan-projected point: |u| = angle from +z (equidistant).
    theta = np.linalg.norm(u, axis=-1)
    sin_t = np.sin(theta)
    dirs = np.where(
        theta[..., None] > 1e-12, u / np.maximum(theta, 1e-12)[..., None], 0.0
    )
    rays = np.stack(
        [sin_t * dirs[..., 0], sin_t * dirs[..., 1], np.cos(theta)], axis=-1
    )
    # nonconverged pixels (beyond the invertible image circle) get a
    # backward ray so they can never hit geometry in front of the camera
    rays = np.where(ok[..., None], rays, np.array([0.0, 0.0, -1.0]))
    return rays.astype(np.float32)


def fisheye_ray_grid(cam_js: dict, h: int | None = None,
                     w: int | None = None) -> np.ndarray:
    """Unit eye-space ray per pixel [h, w, 3] for a fisheye62 camera JSON
    (the raw_data schema, video_pose_data.py:63-72); cached per camera."""
    h = int(cam_js["ImageSizeY"]) if h is None else h
    w = int(cam_js["ImageSizeX"]) if w is None else w
    params = tuple(
        float(cam_js[k])
        for k in ("fx", "fy", "cx", "cy", "k1", "k2", "k3", "k4",
                  "p1", "p2", "k5", "k6")
    )
    return _fisheye_ray_grid_cached(params, h, w)


@lru_cache(maxsize=64)
def _pinhole_ray_grid_cached(fx, fy, cx, cy, h, w) -> np.ndarray:
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    d = np.stack([(xs - cx) / fx, (ys - cy) / fy, np.ones_like(xs)], axis=-1)
    return (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)


def pinhole_ray_grid(k33: np.ndarray, h: int, w: int) -> np.ndarray:
    """Unit eye-space ray per pixel [h, w, 3] for a pinhole K."""
    k33 = np.asarray(k33, np.float64)
    return _pinhole_ray_grid_cached(
        float(k33[0, 0]), float(k33[1, 1]), float(k33[0, 2]),
        float(k33[1, 2]), h, w,
    )


def capsules_from_landmarks(lm: np.ndarray, radius_scale: float = 1.0):
    """Landmarks [..., n_hands, 21, 3] -> capsule soup
    (a [..., C, 3], b [..., C, 3], radii [C], albedo [C]) with
    C = n_hands * len(BONES); numpy, world/mm units."""
    lm = np.asarray(lm, np.float32)
    bi = np.asarray(BONES, np.int64)
    a = lm[..., bi[:, 0], :]  # [..., n_hands, 20, 3]
    b = lm[..., bi[:, 1], :]
    n_hands = lm.shape[-3]
    a = a.reshape(*lm.shape[:-3], n_hands * len(BONES), 3)
    b = b.reshape(*lm.shape[:-3], n_hands * len(BONES), 3)
    radii = np.tile(
        np.asarray(BONE_RADIUS_MM, np.float32) * radius_scale, n_hands
    )
    albedo = np.tile(np.asarray(BONE_ALBEDO, np.float32), n_hands)
    return a, b, radii, albedo


def _ray_capsule(d, a, b, r):
    """Nearest positive intersection of unit rays ``d`` [..., 3] from the
    origin with one capsule (a, b, r); returns (t [...], hit like t).
    Standard quadratic body + sphere caps, fully vectorized."""
    ba = b - a
    oa = -a
    baba = jnp.dot(ba, ba)
    bard = jnp.einsum("...i,i->...", d, ba)
    baoa = jnp.dot(ba, oa)
    rdoa = jnp.einsum("...i,i->...", d, oa)
    oaoa = jnp.dot(oa, oa)

    qa = baba - bard * bard  # >= 0; ~0 when the ray parallels the axis
    qb = baba * rdoa - baoa * bard
    qc = baba * oaoa - baoa * baoa - r * r * baba
    h = qb * qb - qa * qc
    safe_a = jnp.where(qa > 1e-6, qa, 1.0)
    t_body = (-qb - jnp.sqrt(jnp.maximum(h, 0.0))) / safe_a
    y = baoa + t_body * bard
    body_ok = (qa > 1e-6) & (h >= 0) & (t_body > 0) & (y >= 0) & (y <= baba)

    def cap(center):
        oc = -center
        b2 = jnp.einsum("...i,i->...", d, oc)
        c2 = jnp.dot(oc, oc) - r * r
        h2 = b2 * b2 - c2
        t = -b2 - jnp.sqrt(jnp.maximum(h2, 0.0))
        return jnp.where((h2 >= 0) & (t > 0), t, BIG)

    t = jnp.minimum(
        jnp.where(body_ok, t_body, BIG), jnp.minimum(cap(a), cap(b))
    )
    return t


def _trace(rays, cap_a, cap_b, radii, albedo):
    """Shared z-buffer over all capsules: returns (depth [h, w] with BIG for
    misses, normal [h, w, 3], albedo [h, w]).  ``lax.scan`` over capsules
    keeps peak memory at O(h*w), not O(h*w*C)."""
    # f32 throughout, regardless of caller dtype (x64 test mode)
    rays = rays.astype(jnp.float32)
    cap_a = cap_a.astype(jnp.float32)
    cap_b = cap_b.astype(jnp.float32)
    radii = radii.astype(jnp.float32)
    albedo = albedo.astype(jnp.float32)

    def step(carry, cap):
        t_best, a_best, alb_best, b_axis_best, r_best = carry
        a, b, r, alb = cap
        t = _ray_capsule(rays, a, b, r)
        closer = t < t_best
        cl3 = closer[..., None]
        return (
            jnp.where(closer, t, t_best),
            jnp.where(cl3, a, a_best),
            jnp.where(closer, alb, alb_best),
            jnp.where(cl3, b - a, b_axis_best),
            jnp.where(closer, r, r_best),
        ), None

    hw = rays.shape[:-1]
    init = (
        jnp.full(hw, BIG, jnp.float32),
        jnp.zeros((*hw, 3), jnp.float32),
        jnp.zeros(hw, jnp.float32),
        jnp.ones((*hw, 3), jnp.float32),
        jnp.ones(hw, jnp.float32),
    )
    (t, a, alb, ba, r), _ = jax.lax.scan(
        step, init, (cap_a, cap_b, radii, albedo)
    )

    pos = rays * t[..., None]
    baba = jnp.maximum(jnp.sum(ba * ba, axis=-1), 1e-6)
    yfrac = jnp.clip(
        jnp.sum((pos - a) * ba, axis=-1) / baba, 0.0, 1.0
    )
    n = (pos - a - ba * yfrac[..., None]) / jnp.maximum(r, 1e-6)[..., None]
    n = n / jnp.maximum(
        jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-6
    )
    return t, n, alb


def _shade(rays, depth, normal, alb, bg, light_eye, amb, diff, spec,
           depth_gain):
    """Mono shading: Lambert + Blinn-Phong + a mild nearer-is-brighter depth
    cue (the stroke renderer's depth shading, kept as a translation cue)."""
    hit = depth < BIG
    l = -light_eye  # direction TOWARD the light
    lam = jnp.maximum(jnp.einsum("...i,i->...", normal, l), 0.0)
    half = l - rays
    half = half / jnp.maximum(
        jnp.linalg.norm(half, axis=-1, keepdims=True), 1e-6
    )
    sp = jnp.maximum(jnp.einsum("...i,...i->...", normal, half), 0.0) ** 16
    z = depth * rays[..., 2]  # eye-space z depth (mm)
    depth_cue = 1.0 + depth_gain * (450.0 - z) / 330.0
    col = (alb * (amb + diff * lam) * depth_cue + spec * sp) * 255.0
    return jnp.where(hit, jnp.clip(col, 0.0, 255.0), bg)


@partial(jax.jit, static_argnames=())
def render_views(
    rays: jnp.ndarray,  # [N, h, w, 3] unit eye rays per camera
    world_to_cam: jnp.ndarray,  # [N, 4, 4]
    cap_a: jnp.ndarray,  # [T, C, 3] world (mm)
    cap_b: jnp.ndarray,  # [T, C, 3]
    radii: jnp.ndarray,  # [C]
    albedo: jnp.ndarray,  # [C]
    bg: jnp.ndarray,  # [T, N, h, w] background, 0..255
    light_world: jnp.ndarray,  # [3] unit
    shade_params: jnp.ndarray,  # [4]: ambient, diffuse, specular, depth_gain
) -> jnp.ndarray:  # [T, N, h, w] uint8
    """Render every (frame, camera) of a sequence on the accelerator."""
    amb, diff, spec, depth_gain = (
        shade_params[0], shade_params[1], shade_params[2], shade_params[3]
    )

    def one_view(rays_c, w2c, a_w, b_w, bg_c):
        rot = w2c[:3, :3]
        tr = w2c[:3, 3]
        a_eye = a_w @ rot.T + tr
        b_eye = b_w @ rot.T + tr
        light_eye = rot @ light_world
        depth, normal, alb = _trace(rays_c, a_eye, b_eye, radii, albedo)
        return _shade(
            rays_c, depth, normal, alb, bg_c, light_eye, amb, diff, spec,
            depth_gain,
        )

    def one_frame(args):
        a_w, b_w, bg_f = args
        return jax.vmap(one_view, in_axes=(0, 0, None, None, 0))(
            rays, world_to_cam, a_w, b_w, bg_f
        )

    out = jax.lax.map(one_frame, (cap_a, cap_b, bg.astype(jnp.float32)))
    return jnp.clip(out + 0.5, 0.0, 255.0).astype(jnp.uint8)


def render_sequence(
    landmarks_world: np.ndarray,  # [T, n_hands, 21, 3] mm
    cam_poses: np.ndarray,  # [N, 4, 4] camera-to-world
    cam_jss,  # list of N fisheye camera JSON dicts
    bg: np.ndarray,  # [T, N, h, w] uint8 background
    rng: np.random.Generator,
    radius_scale: float = 1.0,
) -> np.ndarray:  # [T, N, h, w] uint8
    """Host wrapper: build rays/capsules, draw per-sequence shading
    randomization, trace on the default JAX backend, fetch uint8 frames.

    Shading randomization (light direction, ambient/diffuse/specular
    levels, albedo jitter) varies per sequence so the model must read pose
    from geometry, not from a fixed exposure."""
    t, n = bg.shape[:2]
    h, w = bg.shape[2:]
    rays = np.stack(
        [fisheye_ray_grid(cam_jss[c], h, w) for c in range(n)]
    )
    world_to_cam = np.stack(
        [np.linalg.inv(np.asarray(p, np.float64)) for p in cam_poses]
    ).astype(np.float32)

    a, b, radii, albedo = capsules_from_landmarks(
        landmarks_world, radius_scale
    )
    albedo = albedo * rng.uniform(0.85, 1.15)
    # light from the hemisphere behind/above the cameras (z < 0 world side)
    ld = rng.standard_normal(3)
    ld[2] = -abs(ld[2]) - 0.3
    ld = (ld / np.linalg.norm(ld)).astype(np.float32)
    shade = np.asarray(
        [
            rng.uniform(0.30, 0.50),  # ambient
            rng.uniform(0.55, 0.85),  # diffuse
            rng.uniform(0.05, 0.35),  # specular
            rng.uniform(0.10, 0.30),  # depth gain
        ],
        np.float32,
    )

    out = render_views(
        jnp.asarray(rays),
        jnp.asarray(world_to_cam),
        jnp.asarray(a),
        jnp.asarray(b),
        jnp.asarray(radii.astype(np.float32)),
        jnp.asarray(albedo.astype(np.float32)),
        jnp.asarray(bg),
        jnp.asarray(ld),
        jnp.asarray(shade),
    )
    return np.asarray(jax.device_get(out))


def render_pinhole_sequence(
    landmarks_world: np.ndarray,  # [T, n_hands, 21, 3] mm
    cam_poses: np.ndarray,  # [V, 4, 4] camera-to-world
    intrinsics: np.ndarray,  # [V, 3, 3]
    bg: np.ndarray,  # [T, V, h, w] uint8
    rng: np.random.Generator,
    radius_scale: float = 1.0,
) -> np.ndarray:
    """Pinhole-view variant for the torch_data sample generator."""
    t, v = bg.shape[:2]
    h, w = bg.shape[2:]
    rays = np.stack(
        [pinhole_ray_grid(intrinsics[c], h, w) for c in range(v)]
    )
    world_to_cam = np.stack(
        [np.linalg.inv(np.asarray(p, np.float64)) for p in cam_poses]
    ).astype(np.float32)
    a, b, radii, albedo = capsules_from_landmarks(
        landmarks_world, radius_scale
    )
    albedo = albedo * rng.uniform(0.85, 1.15)
    ld = rng.standard_normal(3)
    ld[2] = -abs(ld[2]) - 0.3
    ld = (ld / np.linalg.norm(ld)).astype(np.float32)
    shade = np.asarray(
        [
            rng.uniform(0.30, 0.50),
            rng.uniform(0.55, 0.85),
            rng.uniform(0.05, 0.35),
            rng.uniform(0.10, 0.30),
        ],
        np.float32,
    )
    out = render_views(
        jnp.asarray(rays),
        jnp.asarray(world_to_cam),
        jnp.asarray(a),
        jnp.asarray(b),
        jnp.asarray(radii.astype(np.float32)),
        jnp.asarray(albedo.astype(np.float32)),
        jnp.asarray(bg),
        jnp.asarray(ld),
        jnp.asarray(shade),
    )
    return np.asarray(jax.device_get(out))

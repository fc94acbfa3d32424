"""Capsule ray-traced renderer (utils/render.py): ray-grid round trips,
intersection geometry, occlusion ordering, and sequence integration."""
import jax.numpy as jnp
import numpy as np
import pytest

import synthetic  # noqa: F401  (path setup)

from umetrack_tpu.utils import render as R
from umetrack_tpu.utils import synthetic as S


def test_fisheye_ray_grid_roundtrip():
    """Projecting a point along each pixel's ray must land on that pixel
    (inverse of the fisheye62 forward model used everywhere else)."""
    rays = R.fisheye_ray_grid(S.CAM_JS)
    assert rays.shape == (480, 640, 3)
    ys, xs = np.mgrid[40:440:57, 40:600:83]
    pts = rays[ys, xs] * 300.0  # any positive depth
    pix = S._project_fisheye_np(pts, S.CAM_JS)
    np.testing.assert_allclose(pix[..., 0], xs, atol=1e-3)
    np.testing.assert_allclose(pix[..., 1], ys, atol=1e-3)
    # all in-image rays are unit and forward
    norms = np.linalg.norm(rays, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_pinhole_ray_grid_roundtrip():
    k = np.array([[200.0, 0, 79.5], [0, 200.0, 59.5], [0, 0, 1]])
    rays = R.pinhole_ray_grid(k, 120, 160)
    pts = rays[34, 101] * 157.0
    uv = pts[:2] / pts[2]
    np.testing.assert_allclose(uv[0] * 200 + 79.5, 101, atol=1e-4)
    np.testing.assert_allclose(uv[1] * 200 + 59.5, 34, atol=1e-4)


def test_ray_capsule_sphere_case():
    """Degenerate capsule (a == b) is a sphere; the straight-ahead ray hits
    at center_z - r."""
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0]])
    a = jnp.asarray([0.0, 0.0, 100.0])
    t = R._ray_capsule(d, a, a, jnp.asarray(10.0))
    np.testing.assert_allclose(float(t[0]), 90.0, rtol=1e-5)
    assert float(t[1]) >= R.BIG  # miss


def test_ray_capsule_body_and_parallel():
    # capsule along x at z=50, radius 5; ray straight down +z hits body
    a = jnp.asarray([-10.0, 0.0, 50.0])
    b = jnp.asarray([10.0, 0.0, 50.0])
    d = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    t = R._ray_capsule(d, a, b, jnp.asarray(5.0))
    np.testing.assert_allclose(float(t[0]), 45.0, rtol=1e-5)
    # ray parallel to the axis through the origin: points away, misses
    assert float(t[1]) >= R.BIG


def test_trace_occlusion_order():
    """Two capsules on the same ray: the nearer one must win the z-buffer
    regardless of scan order."""
    rays = jnp.asarray([[[0.0, 0.0, 1.0]]])  # [1, 1, 3]
    cap_a = jnp.asarray([[0.0, 0.0, 200.0], [0.0, 0.0, 100.0]])
    cap_b = cap_a
    radii = jnp.asarray([10.0, 10.0])
    albedo = jnp.asarray([0.25, 0.75])
    depth, normal, alb = R._trace(rays, cap_a, cap_b, radii, albedo)
    np.testing.assert_allclose(float(depth[0, 0]), 90.0, rtol=1e-5)
    np.testing.assert_allclose(float(alb[0, 0]), 0.75)
    # front-facing normal points back toward the camera
    np.testing.assert_allclose(
        np.asarray(normal[0, 0]), [0.0, 0.0, -1.0], atol=1e-5
    )


def test_capsules_from_landmarks_shapes():
    lm = np.zeros((3, 2, 21, 3), np.float32)
    a, b, radii, albedo = R.capsules_from_landmarks(lm, radius_scale=1.1)
    c = 2 * len(R.BONES)
    assert a.shape == (3, c, 3) and b.shape == (3, c, 3)
    assert radii.shape == (c,) and albedo.shape == (c,)
    np.testing.assert_allclose(radii[0], R.BONE_RADIUS_MM[0] * 1.1)


def test_render_sequence_hands_visible_and_deterministic():
    """Integration: the capsule-rendered labels dict draws hands whose
    landmark neighborhoods are hit (nonbackground) in most views, and the
    render is seed-deterministic."""
    labels, images = S.make_labels_dict(
        2, rng_seed=11, render_style="capsule"
    )
    assert images.shape == (2, S.N_CAMS, 480, 640)
    assert images.dtype == np.uint8

    _, images_again = S.make_labels_dict(
        2, rng_seed=11, render_style="capsule"
    )
    np.testing.assert_array_equal(images, images_again)

    # hands visible: wrist/palm landmark pixels differ from a pure-noise
    # render of the same seed in most (frame, cam) pairs
    _, bg_only = S.make_labels_dict(2, rng_seed=11, render=False)
    lm = S.tracker_gt_landmarks(
        labels["hand_model"], labels["joint_angles"],
        labels["wrist_transforms"],
    )
    w2c = np.linalg.inv(
        np.asarray(labels["camera_to_world_transforms"][0], np.float64)
    )
    touched = 0
    total = 0
    for c in range(S.N_CAMS):
        v_eye = lm[0] @ w2c[c, :3, :3].T + w2c[c, :3, 3]
        pix = S._project_fisheye_np(v_eye, labels["cameras"][c])
        for hand in range(2):
            for l in (5, 20):  # wrist, palm center
                x, y = pix[hand, l]
                if 0 <= x < 640 and 0 <= y < 480:
                    total += 1
                    if images[0, c, int(y), int(x)] != bg_only[0, c, int(y), int(x)]:
                        touched += 1
    assert total >= 8
    assert touched / total > 0.7


def test_render_style_default_is_capsule():
    assert S.DEFAULT_RENDER_STYLE == "capsule"

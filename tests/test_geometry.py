"""Parity tests: geometry core vs. the reference numpy implementation."""
import numpy as np
import jax.numpy as jnp
import pytest

from umetrack_tpu.geometry import affine, cameras, crop


def _rand_rigid(rng, translate_scale=100.0):
    # Random rotation via QR
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    m = np.eye(4)
    m[:3, :3] = q
    m[:3, 3] = rng.standard_normal(3) * translate_scale
    return m


class TestAffine:
    def test_transforms_match_reference(self, reference):
        from lib.common import affine as ref_affine

        rng = np.random.default_rng(0)
        m = _rand_rigid(rng)
        v = rng.standard_normal((17, 3))
        np.testing.assert_allclose(
            np.asarray(affine.transform3(jnp.asarray(m), jnp.asarray(v))),
            ref_affine.transform3(m, v),
            rtol=1e-6, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(affine.transform_vec3(jnp.asarray(m), jnp.asarray(v))),
            ref_affine.transform_vec3(m, v),
            rtol=1e-6, atol=1e-6,
        )

    def test_from_two_vectors(self, reference):
        from lib.common import affine as ref_affine

        rng = np.random.default_rng(1)
        for _ in range(10):
            a = rng.standard_normal(3)
            b = rng.standard_normal(3)
            ours = np.asarray(affine.from_two_vectors(jnp.asarray(a), jnp.asarray(b)))
            ref = ref_affine.from_two_vectors(a, b)
            np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)

    def test_make_look_at_matrix(self, reference):
        from lib.common import affine as ref_affine

        rng = np.random.default_rng(2)
        for angle in [0.0, 37.5, -90.0]:
            w2e = _rand_rigid(rng)
            center = rng.standard_normal(3) * 50 + np.array([0, 0, 300.0])
            ours = np.asarray(
                affine.make_look_at_matrix(jnp.asarray(w2e), jnp.asarray(center), angle)
            )
            ref = ref_affine.make_look_at_matrix(w2e, center, angle)
            np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)

    def test_rodrigues_vs_scipy(self):
        from scipy.spatial.transform import Rotation

        rng = np.random.default_rng(3)
        aa = rng.standard_normal((32, 3))
        aa[0] = 0.0  # exercise the small-angle branch
        aa[1] = [1e-9, 0, 0]
        ours = np.asarray(affine.rodrigues(jnp.asarray(aa)))
        ref = Rotation.from_rotvec(aa).as_matrix()
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)

    def test_rigid_inverse(self):
        rng = np.random.default_rng(4)
        m = _rand_rigid(rng)
        inv = np.asarray(affine.rigid_inverse(jnp.asarray(m)))
        np.testing.assert_allclose(inv @ m, np.eye(4), atol=1e-5)


FISHEYE_JSON = {
    "ImageSizeX": 640, "ImageSizeY": 480, "DistortionModel": "FishEye62",
    "fx": 275.0, "fy": 275.0, "cx": 319.5, "cy": 239.5,
    "k1": 0.35, "k2": 0.27, "k3": -0.5, "k4": 0.4, "p1": 1e-4, "p2": -2e-4,
    "k5": 0.0, "k6": 0.0,
}
PINHOLE_JSON = {
    "ImageSizeX": 96, "ImageSizeY": 96, "DistortionModel": "PinholePlane",
    "fx": 120.0, "fy": 120.0, "cx": 47.5, "cy": 47.5,
}


class TestCameras:
    def test_fisheye_project_matches_reference(self, reference):
        from lib.common.camera import read_camera_from_json

        rng = np.random.default_rng(5)
        w2e = _rand_rigid(rng)
        ref_cam = read_camera_from_json(FISHEYE_JSON)
        ref_cam.camera_to_world_xf = np.linalg.inv(w2e)
        cam = cameras.camera_from_json(FISHEYE_JSON, np.linalg.inv(w2e))

        pts_world = rng.standard_normal((50, 3)) * 100 + np.array([0, 0, 200.0])
        ref_eye = ref_cam.world_to_eye(pts_world)
        ref_win = ref_cam.eye_to_window(ref_eye)

        eye = np.asarray(cam.world_to_eye(jnp.asarray(pts_world)))
        win = np.asarray(cam.eye_to_window(jnp.asarray(eye)))
        np.testing.assert_allclose(eye, ref_eye, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(win, ref_win, rtol=1e-4, atol=1e-3)

    def test_pinhole_roundtrip_and_reference(self, reference):
        from lib.common.camera import read_camera_from_json

        rng = np.random.default_rng(6)
        ref_cam = read_camera_from_json(PINHOLE_JSON)
        cam = cameras.camera_from_json(PINHOLE_JSON)

        w = rng.uniform(0, 95, size=(40, 2))
        ref_eye = ref_cam.window_to_eye(w)
        eye = np.asarray(cam.window_to_eye(jnp.asarray(w)))
        np.testing.assert_allclose(eye, ref_eye, rtol=1e-5, atol=1e-6)

        # project(unproject(w)) == w
        win = np.asarray(cam.eye_to_window(jnp.asarray(eye)))
        np.testing.assert_allclose(win, w, rtol=1e-4, atol=1e-3)

    def test_intrinsics_matrix(self):
        cam = cameras.camera_from_json(PINHOLE_JSON)
        k = np.asarray(cam.uv_to_window_matrix())
        np.testing.assert_allclose(
            k, [[120.0, 0, 47.5], [0, 120.0, 47.5], [0, 0, 1]]
        )


class TestCrop:
    @pytest.mark.parametrize("mirror", [False, True])
    @pytest.mark.parametrize("angle", [0.0, 25.0])
    def test_crop_camera_matches_reference(self, reference, mirror, angle):
        from lib.common.camera import PinholePlaneCameraModel
        from lib.common.crop import gen_crop_parameters_from_points

        rng = np.random.default_rng(7)
        cam_to_world = _rand_rigid(rng, translate_scale=10.0)
        pts_world = rng.standard_normal((63, 3)) * 40
        # Put the point blob in front of the camera.
        fwd = cam_to_world[:3, 2]
        pts_world = pts_world + cam_to_world[:3, 3] + fwd * 400.0

        ref_cam_orig = PinholePlaneCameraModel(
            640, 480, (200.0, 200.0), (319.5, 239.5), [], cam_to_world
        )
        ref_crop = gen_crop_parameters_from_points(
            ref_cam_orig, pts_world, (96, 96), mirror, camera_angle=angle,
        )

        ours = crop.gen_crop_camera_from_points(
            jnp.asarray(cam_to_world),
            jnp.asarray(pts_world),
            (96, 96),
            mirror,
            camera_angle_deg=angle,
        )
        assert bool(ours.valid)
        np.testing.assert_allclose(float(ours.fx), ref_crop.f[0], rtol=1e-5)
        np.testing.assert_allclose(float(ours.fy), ref_crop.f[1], rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray([float(ours.cx), float(ours.cy)]), ref_crop.c, rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(ours.T_world_from_eye),
            ref_crop.camera_to_world_xf,
            rtol=1e-4, atol=1e-4,
        )

    def test_invalid_when_points_straddle_camera(self, reference):
        # Points on both sides of the camera position: after the look-at some
        # points have z <= 0, which the reference rejects with a ValueError
        # (crop.py:25-26) and we report via the valid flag.
        from lib.common.camera import PinholePlaneCameraModel
        from lib.common.crop import gen_crop_parameters_from_points

        pts = np.array([[0.0, 0.0, 100.0], [1.0, 1.0, -100.0]])
        ours = crop.gen_crop_camera_from_points(
            jnp.eye(4), jnp.asarray(pts), (96, 96), False
        )
        assert not bool(ours.valid)

        ref_cam = PinholePlaneCameraModel(640, 480, (200.0, 200.0), (319.5, 239.5), [])
        with pytest.raises(ValueError):
            gen_crop_parameters_from_points(ref_cam, pts, (96, 96), False)

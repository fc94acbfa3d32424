"""Warp/resample parity vs. the reference numpy resampler and cv2.remap."""
import numpy as np
import jax.numpy as jnp

from umetrack_tpu.geometry import cameras
from umetrack_tpu.ops import resample


def test_resample_matches_reference_numpy(reference):
    from lib.batched_dataset.data_transform import _resample_images_batched

    rng = np.random.default_rng(0)
    n, h, w = 3, 64, 80
    images = rng.uniform(0, 255, size=(n, h, w)).astype(np.float64)

    # Random mild homographies around identity.
    xfs = np.tile(np.eye(4), (n, 1, 1))
    xfs[:, 0:2, 0:2] += rng.standard_normal((n, 2, 2)) * 0.05
    xfs[:, 0:2, 3] = rng.standard_normal((n, 2)) * 3.0
    xfs[:, 2, 0:2] = rng.standard_normal((n, 2)) * 1e-4

    out_ref = np.zeros((n, 48, 56))
    _resample_images_batched(images, out_ref, xfs)

    out = np.asarray(
        resample.resample_images(
            jnp.asarray(images), jnp.asarray(xfs), (48, 56)
        )
    )
    np.testing.assert_allclose(out, out_ref, rtol=1e-6, atol=1e-6)


def test_fisheye_warp_matches_reference_warp_image(reference):
    """Full crop warp vs. the tracker's cv2.remap path (interior pixels)."""
    import cv2
    from lib.common.camera import read_camera_from_json, PinholePlaneCameraModel
    from lib.tracker.tracker import _warp_image

    js = {
        "ImageSizeX": 160, "ImageSizeY": 120, "DistortionModel": "FishEye62",
        "fx": 70.0, "fy": 70.0, "cx": 79.5, "cy": 59.5,
        "k1": 0.3, "k2": 0.2, "k3": -0.2, "k4": 0.1, "p1": 1e-4, "p2": -1e-4,
        "k5": 0.0, "k6": 0.0,
    }
    rng = np.random.default_rng(1)
    src_ref = read_camera_from_json(js)
    # smooth image so bilinear interpolation differences stay tiny
    base = rng.uniform(0, 255, size=(13, 17))
    image = cv2.resize(base, (160, 120), interpolation=cv2.INTER_CUBIC).astype(
        np.float32
    )

    # crop camera looking roughly forward, sharing the source position
    dst_ref = PinholePlaneCameraModel(
        96, 96, (110.0, 110.0), (47.5, 47.5), [], np.eye(4)
    )
    rot = np.eye(4)
    c, s = np.cos(0.1), np.sin(0.1)
    rot[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    dst_ref.camera_to_world_xf = rot

    ref_out = _warp_image(src_ref, dst_ref, image).astype(np.float64)

    src = cameras.camera_from_json(js, np.eye(4, dtype=np.float32))
    ours = np.asarray(
        resample.warp_fisheye_to_pinhole(
            jnp.asarray(image, jnp.float64),
            jnp.asarray(dst_ref.uv_to_window_matrix()),
            jnp.asarray(rot),
            src,
            (96, 96),
        )
    )
    # Border rule differs by design (we zero the last row/col band, cv2
    # interpolates with the constant border), so compare where both sampled
    # strictly inside, and check masked pixels are zero.
    inside = ours != 0
    assert inside.mean() > 0.5
    np.testing.assert_allclose(ours[inside], ref_out[inside], rtol=5e-3, atol=0.5)


def test_bilinear_sample_oob_zero():
    img = jnp.ones((8, 8))
    coords = jnp.asarray(
        [[-1.0, 2.0], [2.0, -0.5], [7.5, 2.0], [2.0, 7.2], [3.5, 3.5], [6.99, 6.99]]
    )
    out = np.asarray(resample.bilinear_sample(img, coords))
    np.testing.assert_allclose(out, [0, 0, 0, 0, 1, 1], atol=1e-6)

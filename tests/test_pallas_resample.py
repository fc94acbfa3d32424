"""Pallas warp kernel correctness (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp

from umetrack_tpu.ops import resample
from umetrack_tpu.ops.pallas_resample import (
    pallas_bilinear_sample,
    pallas_bilinear_sample_pool,
    pallas_bilinear_sample_windowed,
)


def test_matches_gather_sampler_uint8():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(480, 640)).astype(np.float32)
    coords = rng.uniform(-10, 650, size=(96, 96, 2)).astype(np.float32)

    ref = np.asarray(
        resample.bilinear_sample(jnp.asarray(img), jnp.asarray(coords), "gather2d")
    )
    out = np.asarray(
        pallas_bilinear_sample(jnp.asarray(img), jnp.asarray(coords), interpret=True)
    )
    # uint8-valued image: bf16 one-hot matmul is exact; lerp in f32
    np.testing.assert_allclose(out, ref, atol=1e-3, rtol=1e-5)


def test_nonmultiple_of_128_pixels():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, size=(64, 96)).astype(np.float32)
    coords = rng.uniform(0, 90, size=(37, 2)).astype(np.float32)
    ref = np.asarray(
        resample.bilinear_sample(jnp.asarray(img), jnp.asarray(coords), "gather2d")
    )
    out = np.asarray(
        pallas_bilinear_sample(jnp.asarray(img), jnp.asarray(coords), interpret=True)
    )
    np.testing.assert_allclose(out, ref, atol=1e-3, rtol=1e-5)
    assert out.shape == (37,)


import pytest


@pytest.mark.parametrize("sublanes", [8, 16])
def test_windowed_matches_gather_sampler(sublanes):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, size=(480, 640)).astype(np.float32)
    # include out-of-bounds + window-edge-straddling samples
    coords = rng.uniform(-10, 650, size=(96, 96, 2)).astype(np.float32)
    coords[0, :, 0] = 127.5  # x corners straddle the 128-px window edge
    coords[1, :, 1] = 255.5  # y corners straddle a window edge

    ref = np.asarray(
        resample.bilinear_sample(jnp.asarray(img), jnp.asarray(coords), "gather2d")
    )
    out = np.asarray(
        pallas_bilinear_sample_windowed(
            jnp.asarray(img), jnp.asarray(coords), interpret=True,
            sublanes=sublanes,
        )
    )
    np.testing.assert_allclose(out, ref, atol=1e-3, rtol=1e-5)


def test_windowed_smooth_coords_hits_window_path():
    """Crop-like smooth coords: every block fits its window, so this
    exercises the windowed branch (random coords all fall back)."""
    rng = np.random.default_rng(4)
    img = rng.integers(0, 255, size=(480, 640)).astype(np.float32)
    gy, gx = np.mgrid[0:96, 0:96].astype(np.float32)
    # ~2.2 px/crop-px scale with a mild rotation, like a tracking crop
    ang = 0.3
    sx = 2.2 * (np.cos(ang) * gx - np.sin(ang) * gy) + 240.3
    sy = 2.2 * (np.sin(ang) * gx + np.cos(ang) * gy) + 120.7
    coords = np.stack([sx, sy], axis=-1)

    ref = np.asarray(
        resample.bilinear_sample(jnp.asarray(img), jnp.asarray(coords), "gather2d")
    )
    out = np.asarray(
        pallas_bilinear_sample_windowed(
            jnp.asarray(img), jnp.asarray(coords), interpret=True
        )
    )
    # x64 test mode promotes the gather reference to f64; the kernel's f32
    # lerp of 0..255-scale values carries ~255*2^-15 = 0.008 rounding.  The
    # full-height kernel shows the identical delta on these coords.
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=1e-5)


def test_win_cm_matches_gather_sampler():
    """The production TPU default (pallas_win_cm): its coord-transpose
    round trip and the win_x=64 window / full-image fallback logic must hold
    in interpret mode too (ADVICE r4: the cm path was TPU-only-tested).
    Covers both the windowed branch (smooth crop-like grid) and the
    full-image fallback (random out-of-window samples)."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, size=(480, 640)).astype(np.float32)

    # crop-like smooth grid: every block fits its 64x256 window
    gy, gx = np.mgrid[0:96, 0:96].astype(np.float32)
    ang = 0.25
    sx = 2.1 * (np.cos(ang) * gx - np.sin(ang) * gy) + 250.2
    sy = 2.1 * (np.sin(ang) * gx + np.cos(ang) * gy) + 110.6
    smooth = np.stack([sx, sy], axis=-1)

    # scattered grid incl. out-of-bounds: forces the full-image fallback
    scattered = rng.uniform(-10, 650, size=(96, 96, 2)).astype(np.float32)

    for coords in (smooth, scattered):
        ref = np.asarray(
            resample.bilinear_sample(
                jnp.asarray(img), jnp.asarray(coords), "gather1d"
            )
        )
        out = np.asarray(
            resample.bilinear_sample(
                jnp.asarray(img), jnp.asarray(coords), "pallas_win_cm",
                interpret=True,
            )
        )
        np.testing.assert_allclose(out, ref, atol=2e-2, rtol=1e-5)
        assert out.shape == (96, 96)


def test_windowed_nonmultiple_shapes():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, size=(480, 640)).astype(np.float32)
    coords = rng.uniform(0, 470, size=(37, 2)).astype(np.float32)
    ref = np.asarray(
        resample.bilinear_sample(jnp.asarray(img), jnp.asarray(coords), "gather2d")
    )
    out = np.asarray(
        pallas_bilinear_sample_windowed(
            jnp.asarray(img), jnp.asarray(coords), interpret=True
        )
    )
    np.testing.assert_allclose(out, ref, atol=1e-3, rtol=1e-5)
    assert out.shape == (37,)


@pytest.mark.parametrize("column_major,sublanes,win_x", [
    (True, 8, 64),
    (False, 8, 64),
    # bigger blocks (fewer grid steps — the round-5 overhead lever): 3072-
    # and 4608-pixel blocks divide the 9216-pixel crop exactly
    (True, 24, 128),
    (True, 36, 192),
])
def test_pool_kernel_matches_gather(column_major, sublanes, win_x):
    """Image-pool kernel (scalar-prefetched source index): every warp must
    sample ITS image exactly like the per-image gather sampler, for both
    windowed and fallback blocks and de-duplicated source indices."""
    rng = np.random.default_rng(5)
    pool = rng.integers(0, 255, size=(4, 480, 640)).astype(np.float32)

    gy, gx = np.mgrid[0:96, 0:96].astype(np.float32)
    warps, srcs = [], []
    for i, (ang, scale, ox, oy) in enumerate([
        (0.2, 2.2, 250.0, 120.0),
        (-0.3, 1.8, 300.0, 200.0),
        (0.05, 2.5, 100.0, 60.0),
        (0.4, 2.0, 400.0, 250.0),
        (0.0, 2.1, 240.0, 130.0),
    ]):
        sx = scale * (np.cos(ang) * gx - np.sin(ang) * gy) + ox
        sy = scale * (np.sin(ang) * gx + np.cos(ang) * gy) + oy
        warps.append(np.stack([sx, sy], axis=-1))
        srcs.append(i % 3)  # duplicated + skipped pool entries
    # a scattered warp that forces the full-image fallback (+ out of bounds)
    warps.append(rng.uniform(-10, 650, size=(96, 96, 2)).astype(np.float32))
    srcs.append(3)
    coords = np.stack(warps)
    src_idx = np.asarray(srcs, np.int32)

    out = np.asarray(
        pallas_bilinear_sample_pool(
            jnp.asarray(pool), jnp.asarray(coords), jnp.asarray(src_idx),
            interpret=True, column_major=column_major,
            sublanes=sublanes, win_x=win_x,
        )
    )
    for i in range(len(srcs)):
        ref = np.asarray(
            resample.bilinear_sample(
                jnp.asarray(pool[src_idx[i]]), jnp.asarray(coords[i]),
                "gather1d",
            )
        )
        np.testing.assert_allclose(out[i], ref, atol=2e-2, rtol=1e-5)


def test_pool_kernel_nonmultiple_block_padding():
    """Warp pixel count not divisible by the block: per-warp padding must
    not leak across warps."""
    rng = np.random.default_rng(6)
    pool = rng.integers(0, 255, size=(2, 200, 300)).astype(np.float32)
    coords = rng.uniform(0, 190, size=(3, 40, 50, 2)).astype(np.float32)
    src_idx = np.asarray([1, 0, 1], np.int32)
    out = np.asarray(
        pallas_bilinear_sample_pool(
            jnp.asarray(pool), jnp.asarray(coords), jnp.asarray(src_idx),
            interpret=True,
        )
    )
    assert out.shape == (3, 40, 50)
    for i in range(3):
        ref = np.asarray(
            resample.bilinear_sample(
                jnp.asarray(pool[src_idx[i]]), jnp.asarray(coords[i]),
                "gather1d",
            )
        )
        np.testing.assert_allclose(out[i], ref, atol=2e-2, rtol=1e-5)

"""Pallas warp kernel correctness (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp

from umetrack_tpu.ops import resample
from umetrack_tpu.ops.pallas_resample import pallas_bilinear_sample


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

"""TPU-gated Pallas warp equality test (VERDICT r1 item 2).

The pytest suite pins the CPU platform (conftest), so this runs the check in
a subprocess against the real chip.  Skipped unless UMETRACK_TPU_TESTS=1 —
a first TPU compile takes minutes through the remote tunnel; the same check
also runs in every `scripts/tpu_warp_check.py` / verify drive.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DRIVER = r"""
import numpy as np, jax, jax.numpy as jnp
from umetrack_tpu.ops.pallas_resample import (
    pallas_bilinear_sample, pallas_bilinear_sample_windowed)
from umetrack_tpu.ops.resample import bilinear_sample
assert jax.devices()[0].platform != "cpu", jax.devices()
rng = np.random.default_rng(0)
img8 = jnp.asarray(rng.integers(0, 256, (480, 640)), jnp.uint8)
coords = jnp.asarray(rng.uniform(-5, 650, (96, 96, 2)).astype(np.float32))
for img in (img8, img8.astype(jnp.float32)):
    out_g = np.asarray(bilinear_sample(img, coords, method="gather1d"))
    for fn in (pallas_bilinear_sample, pallas_bilinear_sample_windowed):
        out_p = np.asarray(fn(img, coords))
        d = float(np.max(np.abs(out_p - out_g)))
        assert d < 1e-3, (fn.__name__, img.dtype, d)
print("PALLAS_TPU_EQUALITY_OK")
"""


@pytest.mark.skipif(
    os.environ.get("UMETRACK_TPU_TESTS") != "1",
    reason="set UMETRACK_TPU_TESTS=1 to run on-device Pallas checks",
)
def test_pallas_matches_gather_on_tpu():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run(
        [sys.executable, "-c", _DRIVER],
        capture_output=True, text=True, timeout=580, cwd=REPO, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "PALLAS_TPU_EQUALITY_OK" in out.stdout

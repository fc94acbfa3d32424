"""2-process jax.distributed smoke (VERDICT r1 item 8): multi-process
initialize, host work sharding, and cross-process on-device metric reduction
via a localhost coordinator — run in subprocesses so the test process's JAX
runtime stays untouched."""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_distributed_smoke():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "distributed_smoke.py")],
        capture_output=True, text=True, timeout=280, cwd=REPO, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "DISTRIBUTED_SMOKE_OK" in out.stdout, out.stdout

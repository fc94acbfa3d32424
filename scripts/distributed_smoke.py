#!/usr/bin/env python
"""2-process ``jax.distributed`` smoke test (VERDICT r1 item 8).

Launches two local CPU processes joined through a localhost coordinator and
verifies the framework's real multi-host pieces end to end:

- ``parallel.distributed.initialize`` executes its multi-process branch
- ``shard_list_for_host`` splits the (synthetic) recording list per process
- each process computes per-sequence errors for its shard on its local
  devices, and the global metric is reduced ON DEVICE across processes via
  a psum over a global mesh (the replacement for the reference's
  filesystem-based aggregation, load_eval.py:50-64)

Run: python scripts/distributed_smoke.py          (parent; spawns 2 workers)
     exits 0 and prints DISTRIBUTED_SMOKE_OK on success.
"""
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(process_id: int, num_processes: int, port: int, out_path: str):
    # Force CPU before any jax import side effects (sitecustomize pins the
    # axon TPU platform; the env var alone is overridden, per verify notes).
    import jax

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, REPO)
    from umetrack_tpu.parallel.distributed import initialize, shard_list_for_host

    idx, count = initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    assert count == num_processes, (idx, count)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    # 1) host-local work sharding: 6 synthetic "recordings"
    recordings = [f"seq_{i:02d}" for i in range(6)]
    mine = shard_list_for_host(recordings)
    assert mine == recordings[idx::count], mine

    # 2) per-host metric (deterministic stand-in for per-sequence errors)
    local_errs = np.asarray(
        [float(int(name.split("_")[1]) + 1) for name in mine], np.float32
    )

    # 3) global on-device reduction over a mesh spanning both processes
    devices = np.asarray(jax.devices()).reshape(count, -1)
    mesh = Mesh(devices, axis_names=("host", "local"))
    n_local = devices.shape[1]

    # pad this host's errors to a common per-host row count divisible by the
    # local device count (zero count = ignored by the weighted mean)
    rows = -(-max(len(local_errs), 1) // n_local) * n_local
    vals = np.zeros((rows,), np.float32)
    cnts = np.zeros((rows,), np.float32)
    vals[: len(local_errs)] = local_errs
    cnts[: len(local_errs)] = 1.0
    stacked = np.stack([vals, cnts], axis=-1)  # [rows, 2]

    garr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(("host", "local"))),
        stacked,
        (count * rows, 2),
    )

    @jax.jit
    def reduce_mean(x):
        total = jnp.sum(x[:, 0])
        n = jnp.sum(x[:, 1])
        return total / jnp.maximum(n, 1.0)

    gmean = float(reduce_mean(garr))
    expected = float(np.mean([1, 2, 3, 4, 5, 6]))
    assert abs(gmean - expected) < 1e-5, (gmean, expected)

    with open(out_path, "w") as fp:
        json.dump({"process": idx, "count": count, "global_mean": gmean}, fp)
    print(f"worker {idx}: global_mean={gmean} OK", flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]), sys.argv[5])
        return 0

    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    tmp = tempfile.mkdtemp(prefix="dist_smoke_")
    outs = [os.path.join(tmp, f"p{i}.json") for i in range(2)]
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
    ).strip()
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             str(i), "2", str(port), outs[i]],
            env=env, cwd=REPO,
        )
        for i in range(2)
    ]
    rcs = [p.wait(timeout=300) for p in procs]
    assert rcs == [0, 0], rcs
    results = [json.load(open(o)) for o in outs]
    assert all(abs(r["global_mean"] - 3.5) < 1e-5 for r in results), results
    assert sorted(r["process"] for r in results) == [0, 1]
    print("DISTRIBUTED_SMOKE_OK", json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())

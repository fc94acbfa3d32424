#!/usr/bin/env python
"""2-process global-mesh training dryrun (VERDICT r3 item 8).

The single-process dryrun (`__graft_entry__.dryrun_multichip`) validates the
sharded train/eval graphs on an 8-virtual-device mesh, but that mesh lives
inside one process — the process-spanning code path (global mesh over
`jax.distributed`, i.e. what rides DCN on a real multi-host pod) is never
exercised there.  This script launches 2 local CPU processes × N/2 virtual
devices each, joins them through a localhost coordinator, builds ONE global
(data, model) mesh whose ``data`` axis spans both processes, and runs a real
`train_step` on it: per-process batch shards assembled with
`jax.make_array_from_process_local_data`, replicated parameters, XLA
inserting the cross-process collectives for the gradient psum.

Run: python scripts/distributed_dryrun.py [--devices 8]
     exits 0 and prints DISTRIBUTED_DRYRUN_OK on success.
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(process_id: int, num_processes: int, n_local: int, port: int,
           out_path: str):
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, REPO)

    from umetrack_tpu.parallel.distributed import initialize

    idx, count = initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    assert count == num_processes, (idx, count)

    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from umetrack_tpu.kinematics.hand import from_dict
    from umetrack_tpu.models import init_model
    from umetrack_tpu.parallel import (
        create_train_state,
        make_mesh,
        synthetic_train_batch,
        train_step,
    )
    from umetrack_tpu.utils.synthetic import load_generic_hand_dict

    devices = jax.devices()  # global: num_processes * n_local
    assert len(devices) == num_processes * n_local, len(devices)
    # data axis spans both processes (the DCN axis on real hardware);
    # model axis stays process-local.
    mesh = make_mesh(devices, model_axis=0)
    data_size = mesh.shape["data"]

    model, variables = init_model(jax.random.PRNGKey(0))
    # Replicated parameters on the global mesh: identical host values in
    # every process, so device_put with a fully-replicated sharding is
    # consistent across the job.
    rep = NamedSharding(mesh, P())
    variables = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, rep), variables
    )

    optimizer = optax.adamw(1e-4)
    ts = create_train_state(variables, optimizer)

    hand = from_dict(load_generic_hand_dict())
    # One global batch of 2*data_size rows; every process builds the same
    # host batch and contributes its addressable rows.
    batch = synthetic_train_batch(0, max(2, 2 * data_size), hand)

    def to_global(a):
        a = np.asarray(a)
        spec = [None] * a.ndim
        if a.ndim >= 1:
            spec[0] = "data"
        sh = NamedSharding(mesh, P(*spec))
        rows = a.shape[0] // count
        local = a[idx * rows: (idx + 1) * rows] if a.ndim >= 1 else a
        return jax.make_array_from_process_local_data(sh, local, a.shape)

    batch = jax.tree_util.tree_map(to_global, batch)

    ts, metrics = train_step(model, optimizer, ts, batch)
    loss = float(metrics["loss"])
    assert np.isfinite(loss), loss

    with open(out_path, "w") as fp:
        json.dump({
            "process": idx,
            "count": count,
            "global_devices": len(devices),
            "mesh": {k: int(v) for k, v in mesh.shape.items()},
            "loss": loss,
        }, fp)
    print(f"worker {idx}: global mesh {dict(mesh.shape)} loss={loss:.4f} OK",
          flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--worker", nargs=4, default=None,
                   metavar=("ID", "NPROC", "NLOCAL", "PORT"))
    p.add_argument("--out", default=None)
    p.add_argument("--devices", type=int, default=8,
                   help="total virtual devices across both processes")
    args = p.parse_args()

    if args.worker:
        worker(int(args.worker[0]), int(args.worker[1]),
               int(args.worker[2]), int(args.worker[3]), args.out)
        return 0

    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    n_local = max(args.devices // 2, 1)
    tmp = tempfile.mkdtemp(prefix="dist_dryrun_")
    outs = [os.path.join(tmp, f"p{i}.json") for i in range(2)]
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_local}"
    ).strip()
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--worker", str(i), "2", str(n_local), str(port),
             "--out", outs[i]],
            env=env, cwd=REPO,
        )
        for i in range(2)
    ]
    rcs = [p_.wait(timeout=600) for p_ in procs]
    assert rcs == [0, 0], rcs
    results = [json.load(open(o)) for o in outs]
    losses = {r["loss"] for r in results}
    assert len(losses) == 1, f"processes disagree on the global loss: {results}"
    assert sorted(r["process"] for r in results) == [0, 1]
    print("DISTRIBUTED_DRYRUN_OK", json.dumps(results[0]))
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Mesh-sharding measurements on the virtual device mesh (VERDICT r2
item 5: measure scaling, don't just compile it).

Real multi-chip hardware is not available in this environment (one TPU v5e
via a tunnel), and the 8 virtual CPU devices share this host's 2 physical
cores — so classic scaling-efficiency curves cannot be measured here: any
"efficiency" number on an oversubscribed host conflates device parallelism
with core saturation.  What CAN be measured honestly on the virtual mesh:

1. **Sharding overhead** — the same total batch evaluated on (data=1) vs
   sharded over (data=8).  Physical compute is identical; any slowdown is
   partitioning/collective overhead.  Measured ~0 overhead means the
   sharded program is the same program, and on real chips (where each
   shard gets its own silicon) throughput scales with the data axis.
2. **TP-vs-DP A/B** — (data=4, model=2) vs (data=8,) at equal total work.
   This is the measurement behind defaulting the mesh to pure data
   parallelism (parallel/mesh.py): at ~1M params, channel sharding's
   collectives cost ~2x.

Run: python scripts/scaling_bench.py [--out SCALING.json]
"""
import argparse
import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402


def build_inputs(s, t_frames):
    from umetrack_tpu.utils import synthetic

    labels, images = synthetic.make_labels_dict(t_frames, rng_seed=0)
    rig, seq, hand = synthetic.our_sequence(labels, images)
    stack = lambda x: jax.tree_util.tree_map(
        lambda a: jnp.stack([a] * s), x
    )
    return stack(rig), stack(seq), stack(hand)


def time_mesh(model, variables, cfg, n_devices, model_axis, s, t_frames,
              reps=3):
    from umetrack_tpu.parallel.eval import (
        eval_sequences_batched,
        make_batched_state,
        shard_eval_inputs,
    )
    from umetrack_tpu.parallel.mesh import make_mesh, shard_variables

    mesh = make_mesh(jax.devices()[:n_devices], model_axis=model_axis)
    rigs, seqs, hands = build_inputs(s, t_frames)
    state = make_batched_state(model, s)
    rigs, seqs, state, hands = shard_eval_inputs(
        mesh, rigs, seqs, state, hands
    )
    vs = shard_variables(variables, mesh)

    def run():
        per_seq, n_valid, gmean = eval_sequences_batched(
            model, cfg, vs, rigs, seqs, state, hands
        )
        return gmean

    float(run())  # warmup + compile
    t0 = time.perf_counter()
    for _ in range(reps):
        g = run()
    float(g)
    dt = (time.perf_counter() - t0) / reps
    return s * t_frames / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--s-total", type=int, default=16,
                   help="total merged sequences (fixed across all configs)")
    p.add_argument("--t", type=int, default=8)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    from umetrack_tpu.models import init_model

    model, variables = init_model(jax.random.PRNGKey(0))
    from umetrack_tpu.tracker import TrackerConfig

    cfg = TrackerConfig()

    result = {"s_total": args.s_total, "t_frames": args.t,
              "physical_cores": os.cpu_count()}

    # 1) sharding overhead: same total work, unsharded vs data-sharded x8
    fps_1 = time_mesh(model, variables, cfg, 1, 1, args.s_total, args.t,
                      reps=args.reps)
    fps_8 = time_mesh(model, variables, cfg, 8, 1, args.s_total, args.t,
                      reps=args.reps)
    overhead = fps_1 / fps_8 - 1.0
    result["sharding_overhead"] = {
        "fps_data1": round(fps_1, 1),
        "fps_data8": round(fps_8, 1),
        "overhead_frac": round(overhead, 4),
    }
    print(
        f"fixed work S={args.s_total}: (data=1) {fps_1:.1f} vs (data=8) "
        f"{fps_8:.1f} frames/s -> sharding overhead {overhead:+.1%}",
        flush=True,
    )

    # 2) TP A/B at equal total work on all 8 devices
    fps_tp = time_mesh(model, variables, cfg, 8, 2, args.s_total, args.t,
                       reps=args.reps)
    result["tp_ab"] = {
        "dp_data8": round(fps_8, 1),
        "tp_data4_model2": round(fps_tp, 1),
        "tp_over_dp": round(fps_tp / fps_8, 3),
    }
    print(
        f"TP A/B: (data=8) {fps_8:.1f} vs (data=4,model=2) {fps_tp:.1f} "
        f"frames/s -> TP/DP = {fps_tp / fps_8:.2f}",
        flush=True,
    )

    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as fp:
            json.dump(result, fp, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())

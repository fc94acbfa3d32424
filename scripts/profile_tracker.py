#!/usr/bin/env python
"""Phase profiling of the batched tracker on the real chip.

Measures, per configuration: warp/prep-only, model-scan-only, and the fused
tracker, with f32 vs bf16 compute — each as ONE jitted callable returning a
scalar (remote-platform rule: every distinct traced op is a compile, so
keep the number of executables tiny and fetch only scalars).

Usage: python scripts/profile_tracker.py [--quick]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed(fn, *args, reps=3):
    """Steady-state seconds/call; fetch of the scalar output is the barrier."""
    out = fn(*args)
    np.asarray(out)  # warmup + compile
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    for o in outs:
        np.asarray(o)
    return (time.perf_counter() - t0) / reps


def sampler_ab(args):
    """A/B the bilinear samplers inside the real tracker prep workload."""
    import jax
    import jax.numpy as jnp

    from umetrack_tpu.tracker import TrackerConfig
    from umetrack_tpu.tracker import tracker as trk
    from umetrack_tpu.utils import synthetic

    t_frames = args.t
    labels, images = synthetic.make_labels_dict(t_frames, rng_seed=0)
    rig, seq, hand = synthetic.our_sequence(labels, images)
    cfg = TrackerConfig()
    s = 8
    stack = lambda x: jax.tree_util.tree_map(lambda a: jnp.stack([a] * s), x)
    rigs, hands, seqs = stack(rig), stack(hand), stack(seq)
    n_warps = s * t_frames * 4

    ref = None
    for name in ["gather1d", "gather2d", "matmul", "pallas", "pallas_win"]:
        scfg = TrackerConfig(sampler=name)

        @jax.jit
        def prep_only(rigs, seqs, hands, scfg=scfg):
            crop_sets, crop_images = jax.vmap(
                lambda r, q, h: trk._prepare_sequence(scfg, r, q, h, 1)
            )(rigs, seqs, hands)
            return jnp.sum(crop_images), crop_images

        try:
            total, imgs = prep_only(rigs, seqs, hands)
            np.asarray(total)
            if ref is None:
                ref = np.asarray(imgs)
                maxdiff = 0.0
            else:
                maxdiff = float(np.max(np.abs(np.asarray(imgs) - ref)))
            t0 = time.perf_counter()
            outs = [prep_only(rigs, seqs, hands)[0] for _ in range(3)]
            for o in outs:
                np.asarray(o)
            dt = (time.perf_counter() - t0) / 3
            print(
                f"sampler {name:9s}: {dt*1e3:8.1f} ms "
                f"({dt/n_warps*1e6:7.1f} us/warp, maxdiff={maxdiff:.2e})",
                flush=True,
            )
        except Exception as e:
            print(f"sampler {name:9s}: FAILED {type(e).__name__}: {e}",
                  flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--samplers", action="store_true")
    p.add_argument("--t", type=int, default=16)
    args = p.parse_args()

    if args.samplers:
        return sampler_ab(args)

    import jax
    import jax.numpy as jnp

    from umetrack_tpu.models import init_model
    from umetrack_tpu.models.config import ModelConfig
    from umetrack_tpu.models.umetrack import TemporalState
    from umetrack_tpu.tracker import TrackerConfig, TrackState
    from umetrack_tpu.tracker import tracker as trk
    from umetrack_tpu.utils import synthetic

    t_frames = args.t
    labels, images = synthetic.make_labels_dict(t_frames, rng_seed=0)
    rig, seq, hand = synthetic.our_sequence(labels, images)
    cfg = TrackerConfig()

    print(f"devices: {jax.devices()}", flush=True)

    s_list = [8] if args.quick else [8, 32, 64]
    dtypes = ["float32", "bfloat16"]

    for compute_dtype in dtypes:
        mcfg = ModelConfig(compute_dtype=compute_dtype)
        model, variables = init_model(jax.random.PRNGKey(0), mcfg)
        for s in s_list:
            stack = lambda x: jax.tree_util.tree_map(
                lambda a: jnp.stack([a] * s), x
            )
            rigs, hands, seqs = stack(rig), stack(hand), stack(seq)
            state = TrackState(
                temporal=TemporalState.zeros(2 * s, mcfg),
                valid_history=jnp.zeros((2 * s,), bool),
            )

            # 1) prep only (crop gen + warps), summed to a scalar
            @jax.jit
            def prep_only(rigs, seqs, hands):
                crop_sets, crop_images = jax.vmap(
                    lambda r, q, h: trk._prepare_sequence(cfg, r, q, h, 1)
                )(rigs, seqs, hands)
                return jnp.sum(crop_images) + jnp.sum(crop_sets.intrinsics)

            dt = timed(prep_only, rigs, seqs, hands)
            n_frames = s * t_frames
            print(
                f"[{compute_dtype} S={s}] prep-only: {dt*1e3:8.1f} ms "
                f"({n_frames/dt:8.0f} frames/s)",
                flush=True,
            )

            # 2) fused tracker (prep + scan)
            @jax.jit
            def fused(rigs, seqs, hands, state):
                res, _ = trk.track_sequences_batched(
                    model, cfg, variables, rigs, seqs, state, hands
                )
                return jnp.sum(res.joint_angles)

            dt_f = timed(fused, rigs, seqs, hands, state)
            print(
                f"[{compute_dtype} S={s}] fused:     {dt_f*1e3:8.1f} ms "
                f"({n_frames/dt_f:8.0f} frames/s) "
                f"-> scan-ish {(dt_f-dt)*1e3:.1f} ms",
                flush=True,
            )

            # rough MFU: backbone ~1 GFLOP per 96x96 crop, 4 crops/frame
            flops = n_frames * 4 * 1.0e9
            print(
                f"[{compute_dtype} S={s}] est backbone TFLOP/s: "
                f"{flops/dt_f/1e12:6.2f}",
                flush=True,
            )


if __name__ == "__main__":
    sys.exit(main())

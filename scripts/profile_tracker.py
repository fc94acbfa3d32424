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
    for name in ["gather1d", "gather2d", "matmul", "pallas", "pallas_win",
                 "pallas_win2", "pallas_win_cm", "pallas_pool"]:
        scfg = TrackerConfig(sampler=name)

        @jax.jit
        def prep_only(rigs, seqs, hands, scfg=scfg):
            # merged prep: the pool sampler must not sit under a vmap (its
            # pallas grid does the batching); other samplers go through the
            # same entry for identical output layout
            crop_sets, crop_images = trk._prepare_sequences_merged(
                scfg, rigs, seqs, hands, 1
            )
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


def phase_split(args):
    """Sub-phase split of prep at one config: crop-gen only, +coordinate
    fields, +sampling (full prep) — three jitted scalars, so the deltas
    attribute prep time to its three terms (ROOFLINE.md round-4 items)."""
    import jax
    import jax.numpy as jnp

    from umetrack_tpu.geometry.cameras import Fisheye62Camera
    from umetrack_tpu.ops.resample import fisheye_to_pinhole_coords
    from umetrack_tpu.tracker import TrackerConfig
    from umetrack_tpu.tracker import tracker as trk
    from umetrack_tpu.tracker.crops import static_crop_points_local
    from umetrack_tpu.utils import synthetic
    from umetrack_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    t_frames = args.t
    s = args.s
    labels, images = synthetic.make_labels_dict(t_frames, rng_seed=0)
    rig, seq, hand = synthetic.our_sequence(labels, images)
    cfg = TrackerConfig()
    stack = lambda x: jax.tree_util.tree_map(lambda a: jnp.stack([a] * s), x)
    rigs, hands, seqs = stack(rig), stack(hand), stack(seq)
    n_frames = s * t_frames
    n_warps = n_frames * 4

    def gen_only_seq(cfg, rig, seq, hand, min_crops):
        static_pts = static_crop_points_local(hand, cfg.num_crop_points)

        def per_frame(obs):
            return trk.gen_crop_set(
                rig, obs.T_world_from_camera, hand, obs.gt_joint_angles,
                obs.gt_wrist_xfs, obs.gt_confidences, cfg, min_crops,
                static_pts,
            )

        return jax.vmap(per_frame)(seq)

    @jax.jit
    def gen_only(rigs, seqs, hands):
        cs = jax.vmap(lambda r, q, h: gen_only_seq(cfg, r, q, h, 1))(
            rigs, seqs, hands
        )
        return (jnp.sum(cs.intrinsics) + jnp.sum(cs.T_world_from_eye)
                + jnp.sum(cs.n_views))

    def coords_for_seq(cfg, rig, seq, hand):
        cs = gen_only_seq(cfg, rig, seq, hand, 1)

        def per_frame(cs_f, t_wc):
            flat_src = cs_f.src_cam_idx.reshape(-1)
            flat_k = cs_f.intrinsics.reshape(-1, 3, 3)
            flat_t = cs_f.T_world_from_eye.reshape(-1, 4, 4)

            def one(src_idx, k, t_wfe):
                cam = Fisheye62Camera(
                    fx=rig.fx[src_idx], fy=rig.fy[src_idx],
                    cx=rig.cx[src_idx], cy=rig.cy[src_idx],
                    width=rig.width[src_idx], height=rig.height[src_idx],
                    coeffs=rig.coeffs[src_idx],
                    T_world_from_eye=t_wc[src_idx],
                )
                return fisheye_to_pinhole_coords(k, t_wfe, cam, cfg.crop_size)

            return jax.vmap(one)(flat_src, flat_k, flat_t)

        return jax.vmap(per_frame)(cs, seq.T_world_from_camera)

    @jax.jit
    def gen_coords(rigs, seqs, hands):
        c = jax.vmap(lambda r, q, h: coords_for_seq(cfg, r, q, h))(
            rigs, seqs, hands
        )
        return jnp.sum(c)

    @jax.jit
    def full_prep(rigs, seqs, hands):
        cs, ci = trk._prepare_sequences_merged(cfg, rigs, seqs, hands, 1)
        return jnp.sum(ci) + jnp.sum(cs.intrinsics)

    dt_gen = timed(gen_only, rigs, seqs, hands)
    dt_gc = timed(gen_coords, rigs, seqs, hands)
    dt_full = timed(full_prep, rigs, seqs, hands)
    print(f"[S={s} T={t_frames}] crop-gen only : {dt_gen*1e3:8.1f} ms", flush=True)
    print(f"[S={s} T={t_frames}] +coord fields : {dt_gc*1e3:8.1f} ms "
          f"(coords ~{(dt_gc-dt_gen)*1e3:.1f} ms, "
          f"{(dt_gc-dt_gen)/n_warps*1e6:.1f} us/warp)", flush=True)
    print(f"[S={s} T={t_frames}] full prep     : {dt_full*1e3:8.1f} ms "
          f"(sampling ~{(dt_full-dt_gc)*1e3:.1f} ms, "
          f"{(dt_full-dt_gc)/n_warps*1e6:.1f} us/warp)", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--samplers", action="store_true")
    p.add_argument("--phases", action="store_true")
    p.add_argument("--t", type=int, default=16)
    p.add_argument("--s", type=int, default=64)
    args = p.parse_args()

    if args.samplers:
        return sampler_ab(args)
    if args.phases:
        return phase_split(args)

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
                crop_sets, crop_images = trk._prepare_sequences_merged(
                    cfg, rigs, seqs, hands, 1
                )
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

#!/usr/bin/env python
"""Device-resident training driver on the tracker-crop domain (round 4).

Phases:
  gen    — render + tracker-prep the corpus once, cache to disk (npz)
  probe  — overfit probe: train on the first --probe-seqs sequences only and
           watch train-domain MPJPE — establishes the renderer's accuracy
           ceiling before burning compute on the full run (VERDICT r3 item 1)
  train  — full run on all sequences, eval on the held-out eval corpus,
           save checkpoint + trajectory JSON

Seed bands: train corpus 5_000+, monitoring eval corpus 905_000+ (disjoint
from the corpus/tracker/gate bands and from the eval apps' 1_000_000+).
"""
import argparse
import json
import logging
import os
import sys
import time

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger("resident_train")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CACHE = os.path.join(REPO, "data_synth", "resident")


def entry_path(tag):
    return os.path.join(CACHE, f"{tag}.npz")


def save_entries(tag, entries):
    import numpy as np

    os.makedirs(CACHE, exist_ok=True)
    flat = {}
    n = len(entries)
    for key in ("images", "intrinsics", "T_world_from_eye", "view_valid",
                "hand_valid", "n_views", "angles", "wrists_mm"):
        arr = np.stack([e[key] for e in entries])
        if key == "images":
            arr = arr.astype(np.float16)  # warp output, [0,1]-ish range
        flat[key] = arr
    flat["scale"] = np.asarray([e["scale"] for e in entries], np.float32)
    hm = entries[0]["hand_model_mm"]
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(hm)
    for i, leaf in enumerate(leaves):
        flat[f"hand_leaf_{i}"] = np.stack([
            jax.tree_util.tree_flatten(e["hand_model_mm"])[0][i]
            for e in entries
        ])
    np.savez_compressed(entry_path(tag), n=n, **flat)
    logger.info("cached %d entries -> %s", n, entry_path(tag))


def load_entries(tag):
    import numpy as np
    import jax

    from umetrack_tpu.kinematics.hand import HandModel

    z = np.load(entry_path(tag), allow_pickle=False)
    n = int(z["n"])
    # rebuild the hand pytree structure from a template
    from umetrack_tpu.utils.synthetic import load_generic_hand_dict
    from umetrack_tpu.kinematics.hand import from_dict

    template = from_dict(load_generic_hand_dict())
    _, treedef = jax.tree_util.tree_flatten(template)
    n_leaves = len(jax.tree_util.tree_flatten(template)[0])
    entries = []
    for i in range(n):
        hand = jax.tree_util.tree_unflatten(
            treedef, [z[f"hand_leaf_{j}"][i] for j in range(n_leaves)]
        )
        entries.append(dict(
            images=z["images"][i].astype(np.float32),
            intrinsics=z["intrinsics"][i],
            T_world_from_eye=z["T_world_from_eye"][i],
            view_valid=z["view_valid"][i],
            hand_valid=z["hand_valid"][i],
            n_views=z["n_views"][i],
            angles=z["angles"][i],
            wrists_mm=z["wrists_mm"][i],
            hand_model_mm=hand,
            scale=float(z["scale"][i]),
        ))
    return entries


def phase_gen(args):
    from umetrack_tpu.apps.train import prepare_tracker_sequences
    from umetrack_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    entries = prepare_tracker_sequences(
        n_seqs=args.n_train, t=args.t, seed0=5000,
    )
    save_entries(f"train_{args.n_train}_{args.t}", entries)
    entries_e = prepare_tracker_sequences(
        n_seqs=args.n_eval, t=args.t, seed0=905_000,
    )
    save_entries(f"eval_{args.n_eval}_{args.t}", entries_e)


def load_corpus(tag):
    """npz -> ResidentCorpus without the per-entry Python round trip."""
    import jax
    import numpy as np

    from umetrack_tpu.kinematics.hand import from_dict
    from umetrack_tpu.parallel.resident import corpus_from_arrays
    from umetrack_tpu.utils.synthetic import load_generic_hand_dict

    z = np.load(entry_path(tag), allow_pickle=False)
    template = from_dict(load_generic_hand_dict())
    leaves, treedef = jax.tree_util.tree_flatten(template)
    hand_b = jax.tree_util.tree_unflatten(
        treedef, [z[f"hand_leaf_{j}"] for j in range(len(leaves))]
    )
    return corpus_from_arrays(
        images=z["images"].astype(np.float32),
        intrinsics=z["intrinsics"],
        T_world_from_eye=z["T_world_from_eye"],
        view_valid=z["view_valid"],
        hand_valid=z["hand_valid"],
        n_views=z["n_views"],
        angles=z["angles"],
        wrists_mm=z["wrists_mm"],
        hand_model_mm_batched=hand_b,
        scales=z["scale"],
    )


def _corpora(args):
    train = load_corpus(f"train_{args.n_train}_{args.t}")
    evalc = load_corpus(f"eval_{args.n_eval}_{args.t}")
    return train, evalc


def _run(args, restrict_seqs=None, tag="train"):
    import jax
    import numpy as np

    from umetrack_tpu.models import init_model
    from umetrack_tpu.models.config import ModelConfig
    from umetrack_tpu.parallel.resident import run_resident_training
    from umetrack_tpu.parallel.train import LossWeights
    from umetrack_tpu.utils.checkpoints import load_checkpoint, save_checkpoint
    from umetrack_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    corpus, evalc = _corpora(args)
    if restrict_seqs:
        # probe trains on a prefix subset WITHOUT changing array shapes (the
        # fused step's compile is shape-keyed on the corpus size)
        import umetrack_tpu.parallel.resident as res

        orig = res.run_resident_training  # noqa: F841 (doc: same compile)

    model, variables = init_model(
        jax.random.PRNGKey(0), ModelConfig(compute_dtype=args.dtype)
    )
    if args.init_ckpt:
        variables = load_checkpoint(args.init_ckpt, variables)
        logger.info("resumed from %s", args.init_ckpt)

    weights = LossWeights(
        angles=args.w_angles,
        wrist_points=args.w_points,
        landmark_nll=args.w_nll,
        scale=args.w_scale,
        wrist_rot_gain=args.rot_gain,
        accel=args.w_accel,
    )

    history_path = os.path.join(REPO, "checkpoints", f"history_{tag}.json")

    def log_fn(m):
        logger.info(
            "step %(step)d: loss=%(loss).4f angle=%(angle_loss).4f "
            "point=%(point_loss).4f nll=%(landmark_nll).4f "
            "accel=%(accel_loss).6f (%(steps_per_s).2f steps/s)" % m
            + (
                "  eval MPJPE %.1f mm MPJPA %.2f deg"
                % (m["eval_mpjpe_mm"], m["eval_mpjpa_deg"])
                if "eval_mpjpe_mm" in m
                else ""
            )
        )

    # restrict sampling for the probe by monkey-limiting the corpus view:
    # we pass a wrapper rng in run_resident_training via seqs range — done
    # by slicing AFTER device put would change shapes; instead probe uses
    # n_probe as the modulo inside a custom loop here.
    if restrict_seqs:
        ts, history = _probe_loop(
            model, variables, corpus, restrict_seqs, args, weights, log_fn
        )
    else:
        def checkpoint_fn(ts_now, step):
            if args.ckpt:
                save_checkpoint(
                    args.ckpt,
                    {"params": ts_now.params,
                     "batch_stats": ts_now.batch_stats},
                )
                logger.info("periodic checkpoint @ step %d -> %s",
                            step, args.ckpt)

        ts, history = run_resident_training(
            model, variables, corpus, eval_corpus=evalc,
            num_steps=args.steps, seqs_per_batch=args.seqs_per_batch,
            window=args.window, learning_rate=args.lr,
            weights=weights, log_every=args.log_every,
            eval_every=args.eval_every, seed=args.seed,
            augment=not args.no_augment, log_fn=log_fn,
            checkpoint_fn=checkpoint_fn, checkpoint_every=2000,
        )

    os.makedirs(os.path.join(REPO, "checkpoints"), exist_ok=True)
    with open(history_path, "w") as fp:
        json.dump(history, fp, indent=1)
    logger.info("history -> %s", history_path)
    if args.ckpt:
        path = save_checkpoint(
            args.ckpt, {"params": ts.params, "batch_stats": ts.batch_stats}
        )
        logger.info("checkpoint -> %s", path)

    # inline error decomposition (amortizes the corpus-transfer tax)
    import jax.numpy as jnp
    import numpy as np

    from umetrack_tpu.parallel.resident import resident_diagnose

    variables_f = {"params": ts.params, "batch_stats": ts.batch_stats}
    for split, c in (("train", corpus), ("eval", evalc)):
        idx = jnp.asarray(
            np.arange(min(16, c.n_sequences)) % c.n_sequences, jnp.int32
        )
        if restrict_seqs and split == "train":
            idx = jnp.asarray(np.arange(16) % restrict_seqs, jnp.int32)
        d = resident_diagnose(
            model, variables_f, c, idx, jnp.asarray(0, jnp.int32),
            min(args.window, c.n_frames),
        )
        logger.info("diagnose[%s]: %s", split,
                    {k: round(float(v), 2) for k, v in d.items()})
    return history


def _probe_loop(model, variables, corpus, n_probe, args, weights, log_fn):
    """Overfit probe: identical compile to the full run (same shapes); only
    the index distribution is restricted to the first n_probe sequences, and
    eval runs on those same sequences (train == eval by design)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from umetrack_tpu.parallel.resident import (
        resident_eval_mpjpe, resident_train_step)
    from umetrack_tpu.parallel.train import create_train_state

    lr = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, min(500, max(args.steps // 10, 1)), args.steps,
        args.lr * 0.01,
    )
    optimizer = optax.chain(
        optax.clip_by_global_norm(1.0), optax.adamw(lr, weight_decay=1e-5)
    )
    ts = create_train_state(variables, optimizer)
    rng = np.random.default_rng(args.seed)
    t = corpus.n_frames
    k = min(args.window, t)
    history = []
    t_start = time.perf_counter()
    key = jax.random.PRNGKey(args.seed)
    for step in range(args.steps):
        seq_idx = jnp.asarray(
            rng.choice(n_probe, size=args.seqs_per_batch,
                       replace=n_probe < args.seqs_per_batch),
            jnp.int32,
        )
        t0 = jnp.asarray(rng.integers(0, t - k + 1), jnp.int32)
        key, sub = jax.random.split(key)
        ts, metrics = resident_train_step(
            model, optimizer, ts, corpus, seq_idx, t0, weights, k,
            aug_key=sub, augment=False,
        )
        if step % args.log_every == 0 or step == args.steps - 1:
            m = {kk: float(v) for kk, v in metrics.items()}
            m["step"] = step
            m["steps_per_s"] = (step + 1) / (time.perf_counter() - t_start)
            if step % args.eval_every == 0 or step == args.steps - 1:
                eval_idx = jnp.asarray(
                    np.arange(args.seqs_per_batch) % n_probe, jnp.int32
                )
                mpjpe, mpjpa = resident_eval_mpjpe(
                    model,
                    {"params": ts.params, "batch_stats": ts.batch_stats},
                    corpus, eval_idx, jnp.asarray(0, jnp.int32), k,
                )
                m["eval_mpjpe_mm"] = float(mpjpe)
                m["eval_mpjpa_deg"] = float(mpjpa)
            history.append(m)
            log_fn(m)
    return ts, history


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("phase", choices=["gen", "probe", "train"])
    p.add_argument("--n-train", type=int, default=256)
    p.add_argument("--n-eval", type=int, default=16)
    p.add_argument("--t", type=int, default=16)
    p.add_argument("--probe-seqs", type=int, default=8)
    p.add_argument("--steps", type=int, default=30_000)
    p.add_argument("--seqs-per-batch", type=int, default=16)
    p.add_argument("--window", type=int, default=8)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--w-angles", type=float, default=1.0)
    p.add_argument("--w-points", type=float, default=20.0)
    p.add_argument("--w-nll", type=float, default=0.1)
    p.add_argument("--w-scale", type=float, default=0.1)
    p.add_argument("--w-accel", type=float, default=200.0,
                   help="temporal-smoothness (2nd-difference) weight; the "
                   "squared accel mismatch is ~1e-6 m^2 so O(1e3) weights "
                   "give it a comparable gradient share (VERDICT r4 item 2)")
    p.add_argument("--rot-gain", type=float, default=1.0,
                   help="extra gain on the rotation-carrying (centered) "
                   "wrist-point error component")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-every", type=int, default=100)
    p.add_argument("--eval-every", type=int, default=500)
    p.add_argument("--no-augment", action="store_true")
    p.add_argument("--init-ckpt", default=None)
    p.add_argument("--ckpt", default=None)
    args = p.parse_args()

    if args.phase == "gen":
        phase_gen(args)
    elif args.phase == "probe":
        _run(args, restrict_seqs=args.probe_seqs, tag="probe")
    else:
        _run(args, tag="train")


if __name__ == "__main__":
    main()

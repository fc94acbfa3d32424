#!/usr/bin/env python
"""End-to-end accuracy loop on the self-consistent synthetic benchmark
(VERDICT r2 item 1): corpus -> train -> four-cell eval -> RESULTS.md.

The reference's pretrained weights and UmeTrack_data are not distributed
(/root/reference/.MISSING_LARGE_BLOBS:1), so accuracy is closed on rendered
synthetic data: hands drawn geometrically through the real camera models
(utils/synthetic.py), a torch_data corpus written to disk with write_idxbin,
TBPTT training with GT supervision, then the REAL eval apps
(run_eval_known_skeleton / run_eval_unknown_skeleton -> load_eval) over the
four protocol cells {known, unknown} x {separate_hand, hand_hand}
(reference load_eval.py:92-105, README.md:45-100).

Phases (run individually or `all`):
  corpus  — write the rendered torch_data corpus
  train   — TBPTT training on the corpus; saves checkpoints/synthetic.msgpack
  eval    — run the real apps on held-out synthetic raw_data sequences,
            aggregate, and write RESULTS.md
"""
import argparse
import json
import logging
import os
import sys

logging.basicConfig(level=logging.INFO)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_CORPUS = os.path.join(REPO, "data_synth")
DEFAULT_CKPT = os.path.join(REPO, "checkpoints", "synthetic.msgpack")

# Reference-published accuracy per cell for the RESULTS.md comparison column
# (/root/reference/README.md:89-97; real UmeTrack_data, not comparable 1:1
# with the synthetic corpus — reported for context only).
REFERENCE_TABLE = {
    "known_skeleton/separate_hand": (9.4, 3.92),
    "known_skeleton/hand_hand": (10.6, 3.47),
    "unknown_skeleton/separate_hand": (10.0, 3.86),
    "unknown_skeleton/hand_hand": (10.9, 3.44),
}


def phase_corpus(args):
    from umetrack_tpu.utils.synthetic import write_torchdata_corpus

    out = write_torchdata_corpus(
        args.corpus_root, n_train=args.n_train, n_test=args.n_test,
        t=args.corpus_t, seed0=args.seed,
    )
    print(f"corpus written: {out}", flush=True)


def phase_train(args):
    from umetrack_tpu.apps import train as train_app

    # The final state is saved as one msgpack file so the checkpoint can
    # live in the repo (apps/train.py's own --checkpoint-dir writes orbax
    # directories).
    from umetrack_tpu.config import Config

    cfg = Config()
    cfg = Config(
        model=cfg.model, tracker=cfg.tracker,
        data=cfg.data.__class__(**{
            **cfg.data.__dict__,
            "data_roots": (os.path.join(args.corpus_root, "synthetic"),),
        }),
        mesh=cfg.mesh,
        train=cfg.train.__class__(**{
            **cfg.train.__dict__,
            "num_steps": args.steps,
            "batch_size": args.batch_size,
            "tbptt_window": args.window,
            "learning_rate": args.lr,
            "lr_schedule": "cosine",
            # Rebalanced for the wrist: at the defaults the angle/NLL terms
            # saturate (sub-mm landmarks with GT wrist) while the wrist-point
            # term is still far from converged — its gradients were being
            # drowned.  20x makes point_loss fall ~8x faster (measured in the
            # round-3 overfit A/B).
            "loss_wrist_points": args.w_points,
            "log_every": 25,
            "checkpoint_dir": None,
        }),
    )
    from umetrack_tpu.utils.checkpoints import save_checkpoint
    from umetrack_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    batches = train_app.dataset_batches(cfg)
    ts, history = train_app.run_training(
        cfg, batches, init_checkpoint=args.init_ckpt
    )
    path = save_checkpoint(
        args.ckpt, {"params": ts.params, "batch_stats": ts.batch_stats}
    )
    print(f"checkpoint saved: {path} (final loss {history[-1]:.5f})",
          flush=True)


def phase_train_tracker(args):
    """Fine-tune on the tracker's own crop distribution (fisheye prep path —
    the raw_data eval domain), resuming from the torch_data checkpoint."""
    from umetrack_tpu.apps import train as train_app
    from umetrack_tpu.config import Config
    from umetrack_tpu.utils.checkpoints import save_checkpoint
    from umetrack_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    entries = train_app.prepare_tracker_sequences(
        n_seqs=args.tracker_seqs, t=args.corpus_t
    )
    batches = train_app.tracker_domain_batches(
        entries, seqs_per_batch=args.batch_size // 2, window=args.window
    )
    cfg = Config()
    cfg = Config(
        model=cfg.model, tracker=cfg.tracker, data=cfg.data, mesh=cfg.mesh,
        train=cfg.train.__class__(**{
            **cfg.train.__dict__,
            "num_steps": args.steps,
            "batch_size": args.batch_size,
            "tbptt_window": args.window,
            "learning_rate": args.lr,
            "lr_schedule": "cosine",
            "loss_wrist_points": args.w_points,
            "log_every": 25,
            "checkpoint_dir": None,
        }),
    )
    ts, history = train_app.run_training(
        cfg, batches, init_checkpoint=args.init_ckpt
    )
    path = save_checkpoint(
        args.ckpt, {"params": ts.params, "batch_stats": ts.batch_stats}
    )
    print(f"checkpoint saved: {path} (final loss {history[-1]:.5f})",
          flush=True)


def phase_eval(args):
    from umetrack_tpu.apps import load_eval
    from umetrack_tpu.apps import run_eval_known_skeleton as known_app
    from umetrack_tpu.apps import run_eval_unknown_skeleton as unknown_app

    cells = [
        ("known_skeleton", "separate_hand"),
        ("known_skeleton", "hand_hand"),
        ("unknown_skeleton", "separate_hand"),
        ("unknown_skeleton", "hand_hand"),
    ]
    for mode, protocol in cells:
        out_dir = os.path.join(
            args.eval_root, f"eval_results_{mode}", "real", protocol
        )
        syn_mode = "hand_hand" if protocol == "hand_hand" else "separate"
        argv = [
            "--output-dir", out_dir,
            "--checkpoint", args.ckpt,
            "--synthetic", str(args.eval_seqs),
            "--synthetic-frames", str(args.eval_frames),
            "--synthetic-mode", syn_mode,
            "--dtype", args.dtype,
        ]
        print(f"== eval {mode}/{protocol} ==", flush=True)
        if mode == "known_skeleton":
            known_app.main(argv)
        else:
            unknown_app.main(argv)

    summaries = load_eval.main(["--results-root", args.eval_root, "--json"])
    write_results_md(args, summaries)


def write_results_md(args, summaries: dict):
    from umetrack_tpu.metrics import MPJPA_CAVEAT

    lines = [
        "# RESULTS — self-consistent synthetic benchmark (round 5)",
        "",
        "Four-cell eval-protocol table on *rendered synthetic* sequences "
        "(the reference's UmeTrack_data and pretrained weights are not "
        "distributed; see `scripts/accuracy_loop.py`).  The model was "
        "trained on the device-resident tracker-crop corpus "
        "(`scripts/resident_train.py`: crops generated by the REAL tracker "
        "prep from GT poses, TBPTT through the conv-RNN memory); eval runs "
        "the REAL apps (`run_eval_known_skeleton`, "
        "`run_eval_unknown_skeleton` → `load_eval`) on held-out sequences "
        "from a reserved seed band with per-sequence GT hand scales the "
        "model never saw.  Round 5: sequences are rendered by the capsule "
        "ray tracer (`utils/render.py` — shaded 3-D hands with exact "
        "occlusion, attacking the round-4 angle-generalization gap), and "
        "training adds the temporal-smoothness objective "
        "(`LossWeights.accel`).",
        "",
        f"- checkpoint: `{os.path.relpath(args.ckpt, REPO)}`",
        f"- eval: {args.eval_seqs} sequences x {args.eval_frames} frames "
        f"per cell, dtype={args.dtype}",
        "- seed partition: train corpus 5000+, monitoring eval 905000+, "
        "gate 901, eval apps 1000000+ (`--seed-base`) — disjoint bands, "
        "so held-out means held-out on the motion axis too (ADVICE r3).",
        "- reference column: the reference's published numbers on *real* "
        "UmeTrack_data (README.md:89-97) — context, not a like-for-like "
        "comparison.",
        "- " + MPJPA_CAVEAT,
        "",
        "| Cell | MPJPE (mm) | MPJPA (deg) | PCK-AUC | Success rate "
        "| Accel (x GT) | Ref MPJPE / MPJPA (real data) |",
        "|---|---|---|---|---|---|---|",
    ]
    for cell, s in summaries.items():
        ref = REFERENCE_TABLE.get(cell)
        ref_txt = f"{ref[0]} / {ref[1]}" if ref else "—"
        acc = s.get("mean_keypoint_acceleration", float("nan"))
        gt_acc = s.get("gt_mean_keypoint_acceleration", float("nan")) or 1.0
        lines.append(
            f"| {cell} | {s['mpjpe_mm']:.2f} | "
            f"{s.get('mpjpa_deg', float('nan')):.2f} | "
            f"{s['pck_auc']:.4f} | {s['success_rate'] * 100:.1f}% | "
            f"{acc / gt_acc:.1f}x | "
            f"{ref_txt} |"
        )
    lines += [
        "",
        "PCK-AUC is normalized to [0, 1] over 0-50 mm thresholds; the "
        "reference prints the same quantity x100 (its `load_eval.py` scales "
        "the curve by 100 with `normalized_AUC`'s default `y_max=1`).  "
        "Accel (x GT) is the tracked mean 2nd-difference keypoint "
        "acceleration over the GT's (the reference reports the same raw "
        "metric, load_eval.py:26-44); round-4 tracked ~17x GT.",
        "",
        "Gate: `tests/test_accuracy_gate.py` loads this checkpoint and pins "
        "the achieved level on a held-out separate-hand sequence (a "
        "regression gate at GATE_MM; the BASELINE.md north star of <= 10 mm "
        "MPJPE is the target, not the gate).",
    ]
    lines += _trajectory_section()
    path = os.path.join(REPO, "RESULTS.md")
    with open(path, "w") as fp:
        fp.write("\n".join(lines) + "\n")
    print(f"wrote {path}", flush=True)
    print(json.dumps(summaries, indent=2))


def _trajectory_section():
    """Training-trajectory table from the resident trainer's history JSON
    (VERDICT r3 weak item 2: without the trajectory nobody can tell whether
    the number is a plateau or truncated training)."""
    hist_path = os.path.join(REPO, "checkpoints", "history_train.json")
    if not os.path.exists(hist_path):
        return []
    with open(hist_path) as fp:
        hist = json.load(fp)
    rows = [h for h in hist if "eval_mpjpe_mm" in h]
    lines = [
        "",
        "## Training trajectory",
        "",
        "Device-resident TBPTT training (`checkpoints/history_train.json`; "
        "monitoring eval = 16 held-out sequences from the 905000+ band, "
        "window 8, on-device metric — not the full eval protocol above):",
        "",
        "| step | train loss | train angle MSE (rad^2) | eval MPJPE (mm) "
        "| eval MPJPA (deg) |",
        "|---|---|---|---|---|",
    ]
    step_stride = max(len(rows) // 12, 1)
    sampled = rows[::step_stride]
    # Append the final row only when the stride did not already land on it
    # (ADVICE r4: the committed table showed the last step twice).
    if rows and (not sampled or sampled[-1] is not rows[-1]):
        sampled.append(rows[-1])
    for h in sampled:
        lines.append(
            f"| {h['step']} | {h['loss']:.4f} | {h['angle_loss']:.5f} | "
            f"{h['eval_mpjpe_mm']:.1f} | {h['eval_mpjpa_deg']:.2f} |"
        )
    lines += [
        "",
        "Error decomposition at the end of training (resident_diagnose; "
        "train vs held-out split) is logged by `scripts/resident_train.py` "
        "and summarized in the committed RESULTS.md alongside the per-term "
        "findings of the round.",
    ]
    return lines


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "phase", choices=["corpus", "train", "train-tracker", "eval", "all"]
    )
    p.add_argument("--tracker-seqs", type=int, default=96)
    p.add_argument("--corpus-root", default=DEFAULT_CORPUS)
    p.add_argument("--n-train", type=int, default=256)
    p.add_argument("--n-test", type=int, default=16)
    p.add_argument("--corpus-t", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--window", type=int, default=8)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--ckpt", default=DEFAULT_CKPT)
    p.add_argument("--init-ckpt", default=None,
                   help="resume training from an existing checkpoint")
    p.add_argument("--w-points", type=float, default=20.0,
                   help="wrist-point loss weight (see phase_train comment)")
    p.add_argument("--eval-root", default=os.path.join(REPO, "eval_out"))
    p.add_argument("--eval-seqs", type=int, default=8)
    p.add_argument("--eval-frames", type=int, default=64)
    p.add_argument("--dtype", default="auto")
    args = p.parse_args()

    if args.phase in ("corpus", "all"):
        phase_corpus(args)
    if args.phase in ("train", "all"):
        phase_train(args)
    if args.phase == "train-tracker":
        phase_train_tracker(args)
    if args.phase in ("eval", "all"):
        phase_eval(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())

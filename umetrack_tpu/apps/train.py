"""Training driver (greenfield — the reference ships no training code).

Trains the UmeTrack model on torch_data-format sequences: the host loader
parses idx/bin bytes, preprocessing (crops + resample) runs on device, and
single-frame supervised batches drive the pjit'ed train step on a
(data, model) mesh.  ``--synthetic`` trains on generated data so the loop is
exercisable without UmeTrack_data; the pretrained reference weights are not
distributed, so training/distillation is also the route to accuracy parity.
"""
from __future__ import annotations

import argparse
import logging
import time
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config, from_json, to_json
from ..data import Sampler, Split, bundles, find_dataset, iterate_dataset
from ..data.transform import parse_raw_buffers, preprocess_sequence
from ..models import init_model
from ..models.umetrack import FrameInputs, SkeletonInputs
from ..parallel import (
    LossWeights,
    TemporalTrainBatch,
    TrainBatch,
    create_train_state,
    make_mesh,
    shard_batch,
    shard_variables,
    temporal_train_step,
    train_step,
)
from ..utils.checkpoints import save_checkpoint

logger = logging.getLogger(__name__)


from functools import partial


@partial(jax.jit, static_argnames=("crop_size",))
def _build_train_batch(raw_batch, crop_size) -> TrainBatch:
    model_input, target = jax.vmap(
        lambda r: preprocess_sequence(r, crop_size)
    )(raw_batch)
    b, t = model_input.left_images.shape[:2]
    # frame t//2 of each sequence (deterministic; the loader shuffles seqs)
    ti = t // 2
    frame = FrameInputs(
        images=model_input.left_images[:, ti],
        intrinsics=model_input.intrinsics[:, ti],
        extrinsics=model_input.extrinsics_xf[:, ti],
        n_views=jnp.full((b,), model_input.left_images.shape[2], jnp.int32),
        hand_idx=model_input.hand_idx[:, ti].astype(jnp.int32),
        use_memory=jnp.zeros((b,), bool),
    )
    hand = model_input.orig_pose_data.left_hand_model
    skeleton = SkeletonInputs(
        joint_rotation_axes=hand.joint_rotation_axes,
        joint_rest_positions=hand.joint_rest_positions,
    )
    return TrainBatch(
        frame=frame,
        skeleton=skeleton,
        gt_joint_angles=target.gt_joint_angles[:, ti],
        gt_wrist_world=target.gt_wrist_xfs[:, ti],
        hand=hand,
        gt_scales=None if target.gt_scale is None else target.gt_scale,
    )


@partial(jax.jit, static_argnames=("crop_size", "window"))
def _build_temporal_batch(
    raw_batch, crop_size, window, t0=None
) -> TemporalTrainBatch:
    """K-frame supervised windows for TBPTT: the conv-RNN memory is trained
    through time (use_memory False at k=0 then True), with real frame-to-
    frame extrinsics motion so the FTL compensation is in the gradient path
    (reference temporal.py:93-139).

    ``t0`` (traced scalar) picks the window start — the loader passes a
    random offset per batch so successive epochs see different windows of
    each sequence; default = centered.
    """
    model_input, target = jax.vmap(
        lambda r: preprocess_sequence(r, crop_size)
    )(raw_batch)
    b, t = model_input.left_images.shape[:2]
    k = min(window, t)
    if t0 is None:
        t0 = (t - k) // 2
    t0 = jnp.clip(jnp.asarray(t0, jnp.int32), 0, t - k)
    v = model_input.left_images.shape[2]

    def win(a):
        return jax.lax.dynamic_slice_in_dim(a, t0, k, axis=1)

    use_memory = jnp.broadcast_to(
        jnp.arange(k, dtype=jnp.int32) > 0, (b, k)
    )
    frames = FrameInputs(
        images=win(model_input.left_images),
        intrinsics=win(model_input.intrinsics),
        extrinsics=win(model_input.extrinsics_xf),
        n_views=jnp.full((b, k), v, jnp.int32),
        hand_idx=win(model_input.hand_idx).astype(jnp.int32),
        use_memory=use_memory,
    )
    hand = model_input.orig_pose_data.left_hand_model
    skeleton = SkeletonInputs(
        joint_rotation_axes=hand.joint_rotation_axes,
        joint_rest_positions=hand.joint_rest_positions,
    )
    return TemporalTrainBatch(
        frames=frames,
        skeleton=skeleton,
        gt_joint_angles=win(target.gt_joint_angles),
        gt_wrist_world=win(target.gt_wrist_xfs),
        hand=hand,
        gt_scales=None if target.gt_scale is None else target.gt_scale,
    )


def _batch_from_sequences(items, crop_size, window: int = 1, t0=None):
    """Preprocess a list of raw sequences on device; one frame per sequence
    when ``window`` is 1, else a K-frame TBPTT window per sequence starting
    at ``t0`` (random per batch when the loader provides it)."""
    raws = [parse_raw_buffers(it["mono"], it["labels"]) for it in items]
    raw_batch = bundles.collate(raws)
    if window > 1:
        return _build_temporal_batch(raw_batch, tuple(crop_size), window, t0)
    return _build_train_batch(raw_batch, tuple(crop_size))


def _np_rigid_inverse(m: np.ndarray) -> np.ndarray:
    """Inverse of [..., 4, 4] rigid transforms (host numpy)."""
    r = np.swapaxes(m[..., :3, :3], -1, -2)
    t = -np.einsum("...ij,...j->...i", r, m[..., :3, 3])
    out = np.tile(np.eye(4, dtype=m.dtype), (*m.shape[:-2], 1, 1))
    out[..., :3, :3] = r
    out[..., :3, 3] = t
    return out


def prepare_tracker_sequences(
    n_seqs: int = 96,
    t: int = 16,
    seed0: int = 5000,
    scale_jitter: float = 0.15,
    crop_size=(96, 96),
):
    """Precompute tracker-domain training material: run the REAL tracker prep
    (GT-pose crop generation + fisheye->pinhole Pallas warps) over rendered
    synthetic raw_data sequences and cache the crops + geometry on the host.

    Training on these crops puts the model on the exact distribution the
    raw_data eval protocol sees — the torch_data corpus alone leaves a
    pinhole-vs-fisheye appearance gap (measured ~95 mm vs ~30 mm in
    round 3).  Sequences alternate separate / hand_hand and jitter the GT
    hand scale (what the unknown-skeleton protocol must recover).
    """
    from ..tracker import TrackerConfig
    from ..tracker import tracker as trk
    from ..utils import synthetic

    cfg = TrackerConfig()
    prep = jax.jit(
        lambda rig, seq, hand: trk._prepare_sequence(cfg, rig, seq, hand, 1)
    )
    entries = []
    for i in range(n_seqs):
        rng = np.random.default_rng(seed0 + i)
        scale = (
            float(rng.uniform(1 - scale_jitter, 1 + scale_jitter))
            if scale_jitter
            else 1.0
        )
        labels, images = synthetic.make_labels_dict(
            t, rng_seed=seed0 + i, with_dropout=False,
            mode="hand_hand" if i % 2 else "separate",
            hand_scale=scale,
        )
        rig, seq, hand = synthetic.our_sequence(labels, images)
        crop_sets, crop_images = prep(rig, seq, hand)
        hand_m = jax.tree_util.tree_map(
            lambda a: None if a is None else np.asarray(a), hand
        )
        entries.append(dict(
            images=np.asarray(crop_images, np.float32),  # [T, 2, V, h, w]
            intrinsics=np.asarray(crop_sets.intrinsics, np.float32),
            T_world_from_eye=np.asarray(
                crop_sets.T_world_from_eye, np.float32
            ),
            view_valid=np.asarray(crop_sets.view_valid),
            hand_valid=np.asarray(crop_sets.hand_valid),  # [T, 2]
            n_views=np.asarray(crop_sets.n_views, np.int32),
            angles=np.asarray(labels["joint_angles"], np.float32),
            wrists_mm=np.asarray(labels["wrist_transforms"], np.float32),
            hand_model_mm=hand_m,
            scale=scale,
        ))
        if (i + 1) % 16 == 0:
            logger.info("prepared %d/%d tracker sequences", i + 1, n_seqs)
    return entries


def tracker_domain_batches(
    entries,
    seqs_per_batch: int = 16,
    window: int = 8,
    seed: int = 0,
) -> Iterator[TemporalTrainBatch]:
    """TBPTT batches drawn from cached tracker-prep sequences; each sequence
    contributes its two hand rows (row = 2*s + hand, the merged layout), so
    batch rows = 2 * seqs_per_batch.  All-host assembly — the training-step
    jit is the only device work, and its shapes match the torch_data path's
    (no recompile when rows == batch_size)."""
    from ..kinematics.hand import scaled_hand_model

    rng = np.random.default_rng(seed)
    t = entries[0]["images"].shape[0]
    k = min(window, t)
    mm = 0.001

    while True:
        idxs = rng.choice(len(entries), size=seqs_per_batch, replace=False)
        t0 = int(rng.integers(0, t - k + 1))
        sl = slice(t0, t0 + k)

        imgs, intr, extr, nviews, angles, wrists, skel_axes, skel_rest = (
            [], [], [], [], [], [], [], []
        )
        hands, scales, valids = [], [], []
        for j in idxs:
            e = entries[int(j)]
            for h in range(2):
                # supervision mask (ADVICE r3): rows with an invalid hand or
                # zero valid crops keep their fallback geometry but are
                # excluded from the loss.
                hv = e.get("hand_valid")
                valids.append(
                    (hv[sl, h] if hv is not None else np.ones(k, bool))
                    & (e["n_views"][sl, h] > 0)
                )
                imgs.append(e["images"][sl, h])  # [k, V, hh, ww]
                ki = e["intrinsics"][sl, h]
                extr_mm = _np_rigid_inverse(e["T_world_from_eye"][sl, h])
                extr_m = extr_mm.copy()
                extr_m[..., :3, 3] *= mm
                vv = e["view_valid"][sl, h][..., None, None]
                extr_m = np.where(vv, extr_m, extr_m[:, 0:1])
                ki = np.where(vv, ki, ki[:, 0:1])
                intr.append(ki)
                extr.append(extr_m)
                nviews.append(np.maximum(e["n_views"][sl, h], 1))
                angles.append(e["angles"][sl, h])
                w = e["wrists_mm"][sl, h].copy()
                w[..., :3, 3] *= mm
                wrists.append(w)
                hm = jax.tree_util.tree_map(
                    lambda a: None if a is None else a, e["hand_model_mm"]
                )
                hands.append(hm)
                scales.append(e["scale"])

        hand_b = jax.tree_util.tree_map(
            lambda *a: None if a[0] is None else np.stack(a), *hands
        )
        hand_b_m = scaled_hand_model(
            jax.tree_util.tree_map(
                lambda a: None if a is None else jnp.asarray(a), hand_b
            ),
            mm,
        )
        b = len(imgs)
        frames = FrameInputs(
            images=jnp.asarray(np.stack(imgs)),  # [B, k, V, h, w]
            intrinsics=jnp.asarray(np.stack(intr)),
            extrinsics=jnp.asarray(np.stack(extr)),
            n_views=jnp.asarray(np.stack(nviews), jnp.int32),
            hand_idx=jnp.asarray(
                np.tile(np.arange(2, dtype=np.int32), seqs_per_batch)[:, None]
                .repeat(k, axis=1)
            ),
            use_memory=jnp.broadcast_to(
                jnp.arange(k, dtype=jnp.int32) > 0, (b, k)
            ),
        )
        skeleton = SkeletonInputs(
            joint_rotation_axes=hand_b_m.joint_rotation_axes,
            joint_rest_positions=hand_b_m.joint_rest_positions,
        )
        yield TemporalTrainBatch(
            frames=frames,
            skeleton=skeleton,
            gt_joint_angles=jnp.asarray(np.stack(angles)),
            gt_wrist_world=jnp.asarray(np.stack(wrists)),
            hand=hand_b_m,
            gt_scales=jnp.asarray(np.asarray(scales, np.float32)),
            valid=jnp.asarray(np.stack(valids)),
        )


def synthetic_batches(
    batch_size: int, crop_size, window: int = 1
) -> Iterator[TrainBatch]:
    from ..utils.synthetic import make_torchdata_sample

    seed = 0
    while True:
        items = []
        for _ in range(batch_size):
            mono, labels = make_torchdata_sample(
                rng_seed=seed % 50, t=max(window, 1), hand_idx=seed % 2
            )
            items.append({"mono": mono, "labels": labels})
            seed += 1
        yield _batch_from_sequences(items, crop_size, window)


def dataset_batches(cfg: Config) -> Iterator[TrainBatch]:
    datasets = find_dataset(list(cfg.data.data_roots), list(cfg.data.fields))
    dataset = datasets[Split.TRAIN]
    logger.info("training sequences: %d", len(dataset))
    epoch = 0
    k = cfg.train.tbptt_window
    rng_t0 = np.random.default_rng(cfg.data.shuffle_seed + 12345)
    while True:
        sampler = Sampler(
            len(dataset), shuffle=True, seed=cfg.data.shuffle_seed + epoch,
            distrib_info=(cfg.mesh.rank, cfg.mesh.world_size),
        )
        batch = []
        for item in iterate_dataset(
            dataset, sampler, num_threads=cfg.data.num_io_threads,
            max_prefetch=cfg.data.max_prefetch,
        ):
            batch.append(item)
            if len(batch) == cfg.train.batch_size:
                t0 = None
                if k > 1:
                    t_len = int(batch[0]["mono"].shape[0])
                    t0 = jnp.asarray(
                        rng_t0.integers(0, max(t_len - k, 0) + 1), jnp.int32
                    )
                yield _batch_from_sequences(
                    batch, cfg.data.crop_size, k, t0
                )
                batch = []
        epoch += 1


def run_training(
    cfg: Config, batches: Iterator[TrainBatch], num_steps=None,
    init_checkpoint: str | None = None,
):
    model, variables = init_model(jax.random.PRNGKey(0), cfg.model)
    if init_checkpoint:
        from ..utils.checkpoints import load_checkpoint

        variables = load_checkpoint(init_checkpoint, variables)
        logger.info("resumed weights from %s", init_checkpoint)
    devices = jax.devices()
    ma = cfg.mesh.model_axis or (2 if len(devices) % 2 == 0 else 1)
    # The data axis cannot exceed the per-step batch (device_put of a [B]
    # leaf over more than B shards is invalid), so small-batch runs use a
    # subset of the devices.
    data_size = max(1, min(len(devices) // ma, cfg.train.batch_size))
    mesh = make_mesh(devices[: data_size * ma], model_axis=ma)
    logger.info("mesh: %s", dict(mesh.shape))
    variables = shard_variables(variables, mesh)

    if cfg.train.lr_schedule == "cosine":
        total = max(num_steps or cfg.train.num_steps, 2)
        warm = min(cfg.train.warmup_steps, max(total // 10, 1))
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=cfg.train.learning_rate,
            warmup_steps=warm,
            decay_steps=total,
            end_value=cfg.train.learning_rate * 0.01,
        )
    else:
        lr = cfg.train.learning_rate
    # Global-norm clipping guards the TBPTT step against rare exploding
    # batches (e.g. NLL spikes right after a domain shift).
    optimizer = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(lr, weight_decay=cfg.train.weight_decay),
    )
    ts = create_train_state(variables, optimizer)
    weights = LossWeights(
        angles=cfg.train.loss_angles,
        wrist_points=cfg.train.loss_wrist_points,
        landmark_nll=cfg.train.loss_landmark_nll,
        scale=cfg.train.loss_scale,
    )

    num_steps = num_steps or cfg.train.num_steps
    t0 = time.time()
    history = []
    # Overlap host-side batch building (parse + collate + preprocess
    # dispatch) with the device step: one worker thread keeps up to two
    # batches in flight while the chip trains on the previous one.
    from ..data.dataset import prefetch_map

    batches = prefetch_map(
        lambda b: b, iter(batches), num_threads=1, max_prefetch=2
    )
    for step in range(num_steps):
        batch = shard_batch(next(batches), mesh)
        step_fn = (
            temporal_train_step
            if isinstance(batch, TemporalTrainBatch)
            else train_step
        )
        ts, metrics = step_fn(model, optimizer, ts, batch, weights)
        if step % cfg.train.log_every == 0 or step == num_steps - 1:
            loss = float(metrics["loss"])
            history.append(loss)
            rate = (step + 1) / (time.time() - t0)
            logger.info(
                "step %d: loss=%.5f angles=%.5f points=%.5f nll=%.4f "
                "(%.2f steps/s)",
                step, loss, float(metrics["angle_loss"]),
                float(metrics["point_loss"]), float(metrics["landmark_nll"]),
                rate,
            )
        if (
            cfg.train.checkpoint_dir
            and step > 0
            and step % cfg.train.checkpoint_every == 0
        ):
            path = save_checkpoint(
                f"{cfg.train.checkpoint_dir}/step_{step:07d}",
                {"params": ts.params, "batch_stats": ts.batch_stats},
            )
            logger.info("saved checkpoint %s", path)

    if cfg.train.checkpoint_dir:
        path = save_checkpoint(
            f"{cfg.train.checkpoint_dir}/final",
            {"params": ts.params, "batch_stats": ts.batch_stats},
        )
        logger.info("saved final checkpoint %s", path)
    return ts, history


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", default=None, help="JSON config file")
    parser.add_argument("--data", nargs="*", default=None)
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--steps", type=int, default=None)
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument(
        "--window", type=int, default=None,
        help="TBPTT window length (frames); >1 trains the memory through time",
    )
    parser.add_argument("--checkpoint-dir", default=None)
    parser.add_argument("--print-config", action="store_true")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    from ..utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    cfg = from_json(args.config) if args.config else Config()
    if args.data:
        cfg = Config(
            model=cfg.model, tracker=cfg.tracker,
            data=cfg.data.__class__(**{**cfg.data.__dict__, "data_roots": tuple(args.data)}),
            mesh=cfg.mesh, train=cfg.train,
        )
    if args.batch_size or args.checkpoint_dir or args.steps or args.window:
        tr = {**cfg.train.__dict__}
        if args.batch_size:
            tr["batch_size"] = args.batch_size
        if args.checkpoint_dir:
            tr["checkpoint_dir"] = args.checkpoint_dir
        if args.steps:
            tr["num_steps"] = args.steps
        if args.window:
            tr["tbptt_window"] = args.window
        cfg = Config(model=cfg.model, tracker=cfg.tracker, data=cfg.data,
                     mesh=cfg.mesh, train=cfg.train.__class__(**tr))
    if args.print_config:
        print(to_json(cfg))
        return

    if args.synthetic:
        batches = synthetic_batches(
            cfg.train.batch_size, cfg.data.crop_size, cfg.train.tbptt_window
        )
    else:
        assert cfg.data.data_roots, "--data or config data_roots required"
        batches = dataset_batches(cfg)
    run_training(cfg, batches)


if __name__ == "__main__":
    main()

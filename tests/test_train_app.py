"""Training app: loop runs, loss decreases, checkpoints written, config
round-trips."""
import numpy as np


def test_config_roundtrip(tmp_path):
    from umetrack_tpu.config import Config, from_json, to_json

    cfg = Config()
    path = str(tmp_path / "cfg.json")
    to_json(cfg, path)
    cfg2 = from_json(path)
    assert cfg2 == cfg
    assert cfg2.model.n_image_feature_channels == 72
    assert cfg2.tracker.num_crop_points == 63


def test_synthetic_training_overfits(tmp_path):
    from umetrack_tpu.apps.train import run_training, synthetic_batches
    from umetrack_tpu.config import Config, TrainConfig
    import dataclasses

    cfg = Config(
        train=TrainConfig(
            learning_rate=3e-4,
            batch_size=4,
            num_steps=12,
            log_every=2,
            checkpoint_dir=str(tmp_path / "ckpts"),
            checkpoint_every=10,
        )
    )
    batches = synthetic_batches(cfg.train.batch_size, cfg.data.crop_size)
    ts, history = run_training(cfg, batches)
    assert len(history) >= 2
    assert np.isfinite(history[-1])
    assert history[-1] < history[0], history
    assert (tmp_path / "ckpts").exists()
    assert int(ts.step) == 12


def test_train_on_torchdata_tree(tmp_path):
    """dataset_batches pulls real idx/bin files through the loader."""
    from umetrack_tpu.apps.train import dataset_batches
    from umetrack_tpu.config import Config, DataConfig, TrainConfig
    from umetrack_tpu.data import write_idxbin
    from umetrack_tpu.utils.synthetic import make_torchdata_sample

    for i in range(3):
        mono, labels = make_torchdata_sample(rng_seed=i, t=2, hand_idx=i % 2)
        d = tmp_path / f"seq_{i}" / "training"
        d.mkdir(parents=True)
        write_idxbin(str(d / "mono"), mono[None])
        write_idxbin(str(d / "labels"), [labels], msgpack_objects=True)

    cfg = Config(
        data=DataConfig(data_roots=(str(tmp_path),)),
        train=TrainConfig(batch_size=3),
    )
    batch = next(dataset_batches(cfg))
    assert batch.frame.images.shape == (3, 2, 96, 96)
    assert np.isfinite(np.asarray(batch.gt_joint_angles)).all()

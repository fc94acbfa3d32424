"""Data layer: idx/bin format round-trips (incl. cross-reading with the
reference parser), sampler sharding parity, prefetch pipeline, discovery."""
import numpy as np
import pytest

from umetrack_tpu.data import (
    FolderDataset,
    IdxBinFile,
    Sampler,
    Split,
    find_dataset,
    prefetch_map,
    write_idxbin,
)


class TestIdxBin:
    def test_uniform_tensor_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        data = rng.standard_normal((5, 3, 4)).astype(np.float32)
        write_idxbin(str(tmp_path / "mono"), data)
        f = IdxBinFile.open(str(tmp_path / "mono.torch.idx"))
        assert f.shape == (5, 3, 4)
        np.testing.assert_array_equal(f.read_all(), data)
        np.testing.assert_array_equal(f[2], data[2])

    def test_ragged_tensor_roundtrip(self, tmp_path):
        rng = np.random.default_rng(1)
        frames = [
            rng.integers(0, 255, size=(4, 6), dtype=np.uint8),
            rng.integers(0, 255, size=(2, 3), dtype=np.uint8),
        ]
        write_idxbin(str(tmp_path / "ragged"), frames)
        f = IdxBinFile.open(str(tmp_path / "ragged.torch.idx"))
        assert f.shape is None
        for i, fr in enumerate(frames):
            np.testing.assert_array_equal(f[i], fr)

    def test_msgpack_roundtrip(self, tmp_path):
        objs = [{"a": [1, 2, 3], "b": "x"}, {"a": [], "b": "yz", "c": 1.5}]
        write_idxbin(str(tmp_path / "labels"), objs, msgpack_objects=True)
        f = IdxBinFile.open(str(tmp_path / "labels.torch.idx"))
        assert f.is_msgpack
        assert f[0] == objs[0]
        assert f[1] == objs[1]

    def test_reference_parser_reads_our_files(self, reference, tmp_path):
        """Format compatibility: the reference TorchIdx must parse our
        writer's output bit-for-bit."""
        from lib.data_utils.idxbinfile import TorchIdx

        rng = np.random.default_rng(2)
        data = rng.integers(0, 255, size=(7, 8, 9), dtype=np.uint8)
        write_idxbin(str(tmp_path / "x"), data)

        ref = TorchIdx(str(tmp_path / "x.torch.idx"))
        assert ref.shape == (7, 8, 9)
        np.testing.assert_array_equal(ref.read_bin(), data)

        objs = [{"k": [1, 2]}, {"k": []}]
        write_idxbin(str(tmp_path / "y"), objs, msgpack_objects=True)
        ref2 = TorchIdx(str(tmp_path / "y.torch.idx"))
        buf = open(str(tmp_path / "y.torch.bin"), "rb").read()
        assert ref2.view_buffer_at(0, buf) == objs[0]
        assert ref2.view_buffer_at(1, buf) == objs[1]


class TestSampler:
    @pytest.mark.parametrize("n", [10, 11, 13])
    @pytest.mark.parametrize("world", [1, 2, 4])
    @pytest.mark.parametrize("drop_last", [False, True])
    def test_rank_sharding_matches_reference(
        self, reference, n, world, drop_last, monkeypatch
    ):
        import torch.utils.data

        # Newer torch removed Sampler.__init__(data_source); shim it so the
        # reference class constructs.
        monkeypatch.setattr(
            torch.utils.data.Sampler, "__init__", lambda self, *a, **k: None
        )
        from lib.data_utils.async_dataset import Sampler as RefSampler

        for rank in range(world):
            ref = RefSampler(
                range(n), shuffle=False, drop_last=drop_last,
                distrib_info=(rank, world),
            )
            ref_idx = [int(i) for i in iter(ref)]
            ours = Sampler(
                n, shuffle=False, distrib_info=(rank, world),
                pad_to_equal=not drop_last,
            )
            assert list(ours.rank_indices()) == ref_idx

    def test_worker_sharding(self):
        s = Sampler(20, shuffle=False, distrib_info=(0, 2))
        all_idx = sorted(
            int(i)
            for w in range(3)
            for i in s.shard_for_worker(w, 3)
        )
        assert all_idx == sorted(int(i) for i in s.rank_indices())

    def test_shuffle_is_permutation(self):
        s = Sampler(50, shuffle=True, seed=3)
        idx = s.rank_indices()
        assert sorted(idx.tolist()) == list(range(50))
        assert idx.tolist() != list(range(50))


class TestPrefetch:
    def test_order_preserved(self):
        import time
        import random

        def slow_sq(x):
            time.sleep(random.uniform(0, 0.01))
            return x * x

        out = list(prefetch_map(slow_sq, iter(range(50)), num_threads=8))
        assert out == [x * x for x in range(50)]

    def test_exception_propagates(self):
        def boom(x):
            if x == 3:
                raise ValueError("boom")
            return x

        with pytest.raises(ValueError, match="boom"):
            list(prefetch_map(boom, iter(range(10)), num_threads=2))

    def test_early_close(self):
        it = prefetch_map(lambda x: x, iter(range(1000)), max_prefetch=4)
        assert next(it) == 0
        it.close()  # must not hang or leak

    def test_early_close_under_load(self):
        """Cancel path with slow workers and a fast producer: close must
        return promptly and stop the feeder."""
        import time

        produced = []

        def gen():
            for i in range(10_000):
                produced.append(i)
                yield i

        def slow(x):
            time.sleep(0.005)
            return x

        it = prefetch_map(slow, gen(), num_threads=4, max_prefetch=8)
        for _, v in zip(range(5), it):
            pass
        t0 = time.perf_counter()
        it.close()
        assert time.perf_counter() - t0 < 3.0
        n_after_close = len(produced)
        time.sleep(0.1)
        # feeder stopped: nothing more is pulled from the source
        assert len(produced) <= n_after_close + 1
        assert n_after_close < 200  # bounded prefetch never ran ahead far

    def test_bounded_prefetch(self):
        """The producer never runs more than max_prefetch ahead."""
        import time

        produced = []

        def gen():
            for i in range(1000):
                produced.append(i)
                yield i

        it = prefetch_map(lambda x: x, gen(), num_threads=2, max_prefetch=4)
        next(it)
        time.sleep(0.2)
        assert len(produced) < 20
        it.close()


class TestDiscovery:
    def test_find_dataset(self, tmp_path):
        rng = np.random.default_rng(0)
        for seq, split in [("seq_a", "training"), ("seq_b", "testing"),
                           ("seq_c", "testing")]:
            d = tmp_path / "real" / seq / split
            d.mkdir(parents=True)
            n = 3
            write_idxbin(
                str(d / "mono"),
                rng.integers(0, 255, (n, 2, 8, 8), dtype=np.uint8),
            )
            write_idxbin(
                str(d / "labels"),
                [{"i": i} for i in range(n)],
                msgpack_objects=True,
            )

        ds = find_dataset(str(tmp_path), ["mono", "labels"])
        assert len(ds[Split.TRAIN]) == 3
        assert len(ds[Split.TEST]) == 6
        item = ds[Split.TEST][4]
        assert item["mono"].shape == (2, 8, 8)
        assert "i" in item["labels"]

    def test_folder_dataset_ragged_guard(self, tmp_path):
        write_idxbin(str(tmp_path / "a"), np.zeros((2, 3), np.float32))
        write_idxbin(str(tmp_path / "b"), np.zeros((3, 3), np.float32))
        with pytest.raises(AssertionError):
            FolderDataset(str(tmp_path), ["a", "b"])


class TestMapAndSubsample:
    def test_map_dataset_preserves_len_and_index(self):
        from umetrack_tpu.data.dataset import map_dataset

        ds = map_dataset(lambda x: x * 2, list(range(10)))
        assert len(ds) == 10
        assert ds[3] == 6

    def test_subsample(self):
        from umetrack_tpu.data.dataset import subsample

        ds = subsample(list(range(100)), num=10)
        assert len(ds) == 10
        vals = [ds[i] for i in range(10)]
        assert vals[0] == 0 and vals[-1] == 99
        assert vals == sorted(vals)

        ds2 = subsample(list(range(100)), portion=0.5)
        assert len(ds2) == 50


def test_profiling_utils():
    import time as _t

    from umetrack_tpu.utils.profiling import PhaseTimers

    timers = PhaseTimers()
    with timers.phase("warp", items=100):
        _t.sleep(0.01)
    with timers.phase("warp", items=100):
        _t.sleep(0.01)
    rep = timers.report()
    assert "warp" in rep and "2 calls" in rep
    assert timers.items["warp"] == 200


def test_preload_in_memory(tmp_path):
    """IdxBinFile.preload (InMemoryTorchBin analog): identical reads with the
    whole .bin held in RAM, no mmap."""
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (4, 3, 8, 8), dtype=np.uint8)
    write_idxbin(str(tmp_path / "mono"), arr)

    from umetrack_tpu.data.idxbin import IdxBinFile

    lazy = IdxBinFile.open(str(tmp_path / "mono.torch.idx"))
    hot = IdxBinFile.open(str(tmp_path / "mono.torch.idx")).preload()
    assert isinstance(hot._mm, bytes)
    for i in range(4):
        np.testing.assert_array_equal(lazy[i], hot[i])
        np.testing.assert_array_equal(hot[i], arr[i])

    from umetrack_tpu.data.dataset import FolderDataset

    ds = FolderDataset(str(tmp_path), ["mono"], preload=True)
    np.testing.assert_array_equal(ds[2]["mono"], arr[2])

"""Native C++ IO layer: parity with the Python reader + prefetch ring."""
import numpy as np
import pytest

from umetrack_tpu.data import write_idxbin
from umetrack_tpu.data import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def test_tensor_frames_match_python_reader(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.standard_normal((6, 5, 7)).astype(np.float32)
    write_idxbin(str(tmp_path / "x"), data)

    f = native.NativeIdxBin(str(tmp_path / "x.torch.idx"))
    assert len(f) == 6
    for i in range(6):
        np.testing.assert_array_equal(f[i], data[i])
    f.close()


def test_msgpack_frames(tmp_path):
    objs = [{"a": [1, 2], "s": "hi"}, {"a": [3], "s": "yo"}]
    write_idxbin(str(tmp_path / "m"), objs, msgpack_objects=True)
    f = native.NativeIdxBin(str(tmp_path / "m.torch.idx"))
    assert f[0] == objs[0]
    assert f[1] == objs[1]
    f.close()


def test_prefetch_ring_complete_and_correct(tmp_path):
    rng = np.random.default_rng(1)
    data = rng.integers(0, 255, size=(40, 32, 48), dtype=np.uint8)
    write_idxbin(str(tmp_path / "r"), data)

    f = native.NativeIdxBin(str(tmp_path / "r.torch.idx"))
    seen = {}
    for idx, frame in f.iter_prefetched(n_threads=4, capacity=8):
        seen[idx] = frame.copy()
    assert sorted(seen) == list(range(40))
    for i, frame in seen.items():
        np.testing.assert_array_equal(frame, data[i])
    f.close()


def test_prefetch_ring_custom_order(tmp_path):
    data = np.arange(10 * 4, dtype=np.int32).reshape(10, 4)
    write_idxbin(str(tmp_path / "o"), data)
    f = native.NativeIdxBin(str(tmp_path / "o.torch.idx"))
    order = [7, 3, 1]
    got = dict(f.iter_prefetched(order=order, n_threads=2, capacity=2))
    assert sorted(got) == sorted(order)
    for i in order:
        np.testing.assert_array_equal(got[i], data[i])
    f.close()


def test_early_abandon_no_hang(tmp_path):
    data = np.zeros((100, 64), np.float32)
    write_idxbin(str(tmp_path / "e"), data)
    f = native.NativeIdxBin(str(tmp_path / "e.torch.idx"))
    it = f.iter_prefetched(n_threads=2, capacity=4)
    next(it)
    it.close()  # must join workers without deadlock
    f.close()

"""ctypes bindings for the native IO library (native/umetrack_io.cpp).

Zero-copy mmap'd idx/bin frame access and a multi-threaded prefetch ring —
the byte path never holds the GIL.  Falls back transparently to the pure
Python :mod:`idxbin` reader when the shared library is missing; builds it
on demand with g++ when sources are present.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, Optional, Sequence

import numpy as np

from .idxbin import DTYPE_CODES, bin_path_for_idx

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SO_PATH = os.path.join(_REPO_ROOT, "native", "libumetrack_io.so")
_SRC_PATH = os.path.join(_REPO_ROOT, "native", "umetrack_io.cpp")

_lib = None


def _build_library() -> bool:
    if not os.path.exists(_SRC_PATH):
        return False
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-pthread",
             "-o", _SO_PATH, _SRC_PATH],
            check=True, capture_output=True,
        )
        return True
    except Exception:
        return False


def load_library():
    """The loaded CDLL, or None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH) and not _build_library():
        return None
    lib = ctypes.CDLL(_SO_PATH)
    lib.ut_open.restype = ctypes.c_void_p
    lib.ut_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.ut_close.argtypes = [ctypes.c_void_p]
    lib.ut_len.restype = ctypes.c_int64
    lib.ut_len.argtypes = [ctypes.c_void_p]
    lib.ut_dtype_code.restype = ctypes.c_int64
    lib.ut_dtype_code.argtypes = [ctypes.c_void_p]
    lib.ut_frame_ndim.restype = ctypes.c_int64
    lib.ut_frame_ndim.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.ut_frame_dims.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)
    ]
    lib.ut_frame_ptr.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.ut_frame_ptr.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)
    ]
    lib.ut_ring_create.restype = ctypes.c_void_p
    lib.ut_ring_create.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64,
    ]
    lib.ut_ring_next.restype = ctypes.c_int64
    lib.ut_ring_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.ut_ring_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return load_library() is not None


class NativeIdxBin:
    """Native counterpart of :class:`idxbin.IdxBinFile` (tensor frames
    zero-copy; msgpack frames decoded from the mmap'd span)."""

    def __init__(self, idx_path: str, bin_path: Optional[str] = None):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native IO library unavailable")
        self._lib = lib
        bin_path = bin_path or bin_path_for_idx(idx_path)
        self._h = lib.ut_open(idx_path.encode(), bin_path.encode())
        if not self._h:
            raise IOError(f"cannot open {idx_path} / {bin_path}")
        code = int(lib.ut_dtype_code(self._h))
        name = DTYPE_CODES.get(code)
        if name is None:
            raise ValueError(f"unknown dtype code {code}")
        self.is_msgpack = name == "object"
        self.dtype = np.dtype("uint8" if self.is_msgpack else name)

    def __len__(self) -> int:
        return int(self._lib.ut_len(self._h))

    def frame_shape(self, i: int):
        nd = int(self._lib.ut_frame_ndim(self._h, i))
        buf = (ctypes.c_int64 * nd)()
        self._lib.ut_frame_dims(self._h, i, buf)
        return tuple(int(x) for x in buf)

    def _frame_view(self, i: int) -> np.ndarray:
        size = ctypes.c_int64()
        ptr = self._lib.ut_frame_ptr(self._h, i, ctypes.byref(size))
        if not ptr:
            raise IndexError(i)
        return np.ctypeslib.as_array(ptr, shape=(size.value,))

    def __getitem__(self, i: int):
        raw = self._frame_view(i)
        if self.is_msgpack:
            import msgpack

            return msgpack.unpackb(raw.tobytes())
        return raw.view(self.dtype).reshape(self.frame_shape(i))

    def iter_prefetched(
        self,
        order: Optional[Sequence[int]] = None,
        n_threads: int = 4,
        capacity: int = 16,
    ) -> Iterator:
        """(index, frame) pairs, page-prefaulted by native worker threads.

        Order within the prefetch window is completion order.
        """
        if order is None:
            order = range(len(self))
        order_arr = np.asarray(list(order), dtype=np.int64)
        c_order = order_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
        ring = self._lib.ut_ring_create(
            self._h, c_order, len(order_arr), n_threads, capacity
        )
        try:
            ptr = ctypes.POINTER(ctypes.c_uint8)()
            size = ctypes.c_int64()
            while True:
                idx = self._lib.ut_ring_next(
                    ring, ctypes.byref(ptr), ctypes.byref(size)
                )
                if idx < 0:
                    break
                raw = np.ctypeslib.as_array(ptr, shape=(size.value,))
                if self.is_msgpack:
                    import msgpack

                    yield int(idx), msgpack.unpackb(raw.tobytes())
                else:
                    yield int(idx), raw.view(self.dtype).reshape(
                        self.frame_shape(int(idx))
                    )
        finally:
            self._lib.ut_ring_destroy(ring)

    def close(self):
        if self._h:
            self._lib.ut_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def open_idxbin(idx_path: str, bin_path: Optional[str] = None):
    """Native reader when available, pure-Python fallback otherwise."""
    if available():
        return NativeIdxBin(idx_path, bin_path)
    from .idxbin import IdxBinFile

    return IdxBinFile.open(idx_path, bin_path)
